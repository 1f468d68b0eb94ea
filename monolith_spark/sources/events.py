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

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monolith_spark.labels import signature_expr

K_PATTERN = r'"k":\s*(\d+)'

# events.ts is parquet timestamp[us] (no zone) → Spark TIMESTAMP_NTZ.
# With session tz pinned to UTC the NTZ→LTZ cast is the identity, so
# unix_millis matches DuckDB's epoch_ms(ts) exactly (both floor).
TS_MS_SQL = "unix_millis(CAST(ts AS TIMESTAMP))"


def ts_ms_expr(alias: str = "ts_ms") -> "F.Column":
    return F.expr(TS_MS_SQL).alias(alias)


def _ntz_lit(ms: int) -> str:
    """A TIMESTAMP_NTZ literal for an epoch-ms instant (UTC wall clock).
    Literal comparison keeps the predicate on the raw column → parquet
    row-group pushdown, where unix_millis(ts) >= c would not push."""
    dt = datetime.fromtimestamp(ms // 1000, tz=timezone.utc) + timedelta(
        milliseconds=ms % 1000
    )
    return "TIMESTAMP_NTZ'" + dt.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"


def set_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone — every epoch-ms derivation assumes it."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def label_exprs() -> dict[str, "F.Column"]:
    """The label mapping as raw-column expressions (pre-projection).

    Predicates built on these reach the parquet scan: Catalyst does NOT
    simplify element_at(create_map(...)) back to the source column, so
    filtering the materialized map hides e.g. the event_type equality
    from pushdown. Filtering these expressions instead keeps the scan
    pruned — the difference between reading one column stripe and the
    whole table at 100 TB.
    """
    k = F.regexp_extract(F.col("props"), K_PATTERN, 1)
    return {
        "event_type": F.col("event_type"),
        "kb": F.substring(k, 1, 1),
        "user": F.col("user_id").cast("string"),
    }


def ts_range_pred(start_ms: int, end_ms: int):
    """Inclusive ms-range predicate on the RAW timestamp column, so it
    pushes to parquet (ts ∈ [start_ms, end_ms+1ms) covers exactly the
    rows whose floor-ms falls in [start_ms, end_ms])."""
    return F.expr(f"ts >= {_ntz_lit(start_ms)}") & F.expr(f"ts < {_ntz_lit(end_ms + 1)}")


def superset_pred_raw(matchers: dict[str, str]):
    """J4 superset matcher on raw-column label expressions."""
    exprs = label_exprs()
    pred = F.lit(True)
    for key, v in matchers.items():
        pred = pred & (exprs[key] == F.lit(v)) if key in exprs else pred & F.lit(False)
    return pred


def matcher_pred_raw(matchers) -> "F.Column":
    """Full EQ/NEQ/RE/NRE matcher semantics on raw-column exprs
    (missing label = empty string, Prometheus-style)."""
    exprs = label_exprs()
    pred = F.lit(True)
    for m in matchers:
        val = exprs.get(m.name)
        val = F.coalesce(val, F.lit("")) if val is not None else F.lit("")
        if m.type == "EQ":
            p = val == F.lit(m.value)
        elif m.type == "NEQ":
            p = val != F.lit(m.value)
        elif m.type == "RE":
            p = val.rlike(f"^(?:{m.value})$")
        else:
            p = ~val.rlike(f"^(?:{m.value})$")
        pred = pred & p
    return pred


def events_samples(
    spark: SparkSession,
    sf_dir: str,
    with_signature: bool = True,
    matchers: dict[str, str] | None = None,
    label_matchers=None,
    ts_range: tuple[int, int] | None = None,
) -> DataFrame:
    ev = set_utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    # Filters go on raw columns BEFORE the map projection (pushdown).
    if ts_range is not None:
        ev = ev.filter(ts_range_pred(*ts_range))
    if matchers:
        ev = ev.filter(superset_pred_raw(matchers))
    if label_matchers:
        ev = ev.filter(matcher_pred_raw(label_matchers))
    out = _project_samples(ev)
    if with_signature:
        out = out.withColumn("signature", signature_expr("labels"))
    return out


def _project_samples(ev: DataFrame) -> DataFrame:
    """The one canonical events→samples projection — shared by the
    batch and streaming paths so batch results remain the streaming
    oracle by construction."""
    exprs = label_exprs()
    labels = F.create_map(
        F.lit("event_type"), exprs["event_type"],
        F.lit("kb"), exprs["kb"],
        F.lit("user"), exprs["user"],
    )
    return ev.select(
        labels.alias("labels"),
        F.expr(TS_MS_SQL).alias("timestamp"),
        F.col("value"),
    )


def events_samples_stream(
    spark: SparkSession, sf_dir: str, staging_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming twin of events_samples: the driver's events table as a
    file-source stream of samples rows (SURVEY §7.2 M3 — the events
    table standing in for a live remote-write feed). Projection is
    identical to the batch mapping so batch results are the oracle.

    The file stream source only accepts a directory of its own, and the
    fixture dir holds every table — so the events file is symlinked
    into ``staging_dir`` (which in production would simply BE the
    landing directory new files arrive in).
    """
    import os

    set_utc(spark)
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    os.makedirs(staging_dir, exist_ok=True)
    link = os.path.join(staging_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = spark.read.parquet(src).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staging_dir)
    )
    return _project_samples(ev)


# The DuckDB twin of the signature above, for oracle SQL strings.
SIG_SQL = (
    "'event_type=' || event_type || ',kb=' || "
    "substr(regexp_extract(props, '\"k\":\\s*(\\d+)', 1), 1, 1) || "
    "',user=' || CAST(user_id AS VARCHAR)"
)
