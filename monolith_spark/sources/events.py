"""events.parquet → samples-shaped DataFrame.

The driver's ``events`` table stands in for a Prometheus remote-write
stream (SURVEY.md §2.1 S1): each row becomes one sample whose label
set is derived from the event's dimensions. The mapping is fixed so
DuckDB oracles can reproduce the signatures textually:

    labels = {event_type, kb: first digit of props."k", user: user_id}
    timestamp = unix ms of ts (floor, matching DuckDB epoch_ms)
    value = value

Label keys sort as event_type < kb < user, so the canonical signature
is ``event_type=<e>,kb=<d>,user=<u>`` (no escaping needed: values are
alphanumeric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monolith_spark.labels import signature_expr

K_PATTERN = r'"k":\s*(\d+)'


def events_samples(spark: SparkSession, sf_dir: str, with_signature: bool = True) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects natively;
    # read it as int64 nanos. Millisecond conversion must be integer
    # division — nanos exceed 2^53, double math would lose precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.regexp_extract(F.col("props"), K_PATTERN, 1)
    labels = F.create_map(
        F.lit("event_type"), F.col("event_type"),
        F.lit("kb"), F.substring(k, 1, 1),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    out = ev.select(
        labels.alias("labels"),
        F.expr("CAST(ts DIV 1000000 AS BIGINT)").alias("timestamp"),
        F.col("value"),
    )
    if with_signature:
        out = out.withColumn("signature", signature_expr("labels"))
    return out


# The DuckDB twin of the signature above, for oracle SQL strings.
SIG_SQL = (
    "'event_type=' || event_type || ',kb=' || "
    "substr(regexp_extract(props, '\"k\":\\s*(\\d+)', 1), 1, 1) || "
    "',user=' || CAST(user_id AS VARCHAR)"
)
