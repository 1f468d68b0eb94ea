"""Driver-contract workload: named queries + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 surfaces here as a (spark_fn,
oracle_sql) pair over the driver's parquet tables; the driver (and
tests/test_oracle_parity.py) runs both sides and compares row count,
schema, and order-insensitive value hashes.

Float-parity rules (see .claude/skills/verify/SKILL.md):
- money/value aggregates go through DECIMAL casts on BOTH sides, cast
  to double only at the end → bit-identical regardless of summation
  order;
- derived ratios are computed as double ops over those exact doubles;
- no raw double sums, no timestamp-typed output columns.

TSDB queries use the events→samples mapping from
monolith_spark.sources.events; matcher semantics are the engine's
(superset EQ — /root/reference/src/indexer/common.rs:13-21 — plus the
NEQ/RE/NRE extension, SURVEY §7.2 M4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monolith_spark.labels import (
    NEQ,
    RE,
    LabelMatcher,
    matcher_predicate,
    superset_predicate,
)
from monolith_spark.operators.timeseries import latest as _latest
from monolith_spark.sources.events import SIG_SQL, events_samples

# Epoch-ms constants (UTC) inside the events table's 2024-01 range.
JAN1 = 1_704_067_200_000
JAN3 = 1_704_240_000_000
JAN8 = 1_704_672_000_000
JAN15 = 1_705_276_800_000
JAN20 = 1_705_708_800_000
DAY_MS = 86_400_000

DEC = "decimal(18,2)"


@dataclass(frozen=True)
class WorkloadQuery:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_REGISTRY: list[WorkloadQuery] = []


def _q(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY.append(WorkloadQuery(name, fn, oracle))
        return fn

    return deco


def _sum_value(col: str = "value"):
    return F.sum(F.col(col).cast(DEC)).cast("double")


# --------------------------------------------------------------------- TSDB

@_q(
    "ts_superset_eq",
    f"""
    SELECT {SIG_SQL} AS signature, epoch_ms(ts) AS ts_ms, value
    FROM events
    WHERE event_type = 'purchase' AND epoch_ms(ts) BETWEEN {JAN3} AND {JAN20}
    """,
)
def ts_superset_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 superset label match + F3 inclusive trim — the reference's one
    query shape (/root/reference/src/db.rs:202-267)."""
    s = events_samples(spark, sf_dir)
    return (
        s.filter(superset_predicate("labels", {"event_type": "purchase"}))
        .filter(F.col("timestamp").between(JAN3, JAN20))
        .select("signature", F.col("timestamp").alias("ts_ms"), "value")
    )


@_q(
    "ts_multi_matcher",
    f"""
    SELECT {SIG_SQL} AS signature, epoch_ms(ts) AS ts_ms, value
    FROM events
    WHERE event_type = 'click' AND CAST(user_id AS VARCHAR) = '12'
      AND epoch_ms(ts) BETWEEN {JAN8} AND {JAN15}
    """,
)
def ts_multi_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive matchers — Catalyst's ANDed scan replaces the
    reference's k-way posting intersection (J2/J3,
    /root/reference/src/common/utils.rs:56-128)."""
    s = events_samples(spark, sf_dir)
    return (
        s.filter(superset_predicate("labels", {"event_type": "click", "user": "12"}))
        .filter(F.col("timestamp").between(JAN8, JAN15))
        .select("signature", F.col("timestamp").alias("ts_ms"), "value")
    )


@_q(
    "ts_exact_lookup",
    f"""
    SELECT {SIG_SQL} AS signature, epoch_ms(ts) AS ts_ms, value
    FROM events
    WHERE {SIG_SQL} = 'event_type=purchase,kb=8,user=12'
      AND epoch_ms(ts) BETWEEN {JAN1} AND {JAN20}
    """,
)
def ts_exact_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 exact-signature lookup
    (/root/reference/src/indexer/sled_indexer.rs:98-107)."""
    s = events_samples(spark, sf_dir)
    return (
        s.filter(F.col("signature") == "event_type=purchase,kb=8,user=12")
        .filter(F.col("timestamp").between(JAN1, JAN20))
        .select("signature", F.col("timestamp").alias("ts_ms"), "value")
    )


@_q(
    "ts_series_agg",
    f"""
    SELECT {SIG_SQL} AS signature,
           count(*) AS n_points,
           min(epoch_ms(ts)) AS min_ts,
           max(epoch_ms(ts)) AS max_ts,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) / count(*) AS avg_value
    FROM events
    WHERE epoch_ms(ts) BETWEEN {JAN1} AND {JAN20}
    GROUP BY 1
    """,
)
def ts_series_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series stats (A1 assembly summarized) — one shuffle on the
    series key with map-side partial aggregation."""
    s = events_samples(spark, sf_dir).filter(F.col("timestamp").between(JAN1, JAN20))
    agg = s.groupBy("signature").agg(
        F.count("*").alias("n_points"),
        F.min("timestamp").alias("min_ts"),
        F.max("timestamp").alias("max_ts"),
        _sum_value().alias("sum_value"),
    )
    return agg.withColumn("avg_value", F.col("sum_value") / F.col("n_points"))


@_q(
    "ts_downsample_1d",
    f"""
    SELECT {SIG_SQL} AS signature,
           (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS bucket_ms,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) / count(*) AS avg_value,
           count(*) AS n_points
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2
    """,
)
def ts_downsample_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReadHints.step_ms downsampling — parsed-but-ignored by the
    reference (/root/reference/src/proto/types.rs:1248-1257), realized
    as a bucketed aggregate."""
    s = events_samples(spark, sf_dir).filter(
        superset_predicate("labels", {"event_type": "error"})
    )
    bucket = (F.floor(F.col("timestamp") / DAY_MS) * DAY_MS).cast("long").alias("bucket_ms")
    return (
        s.groupBy("signature", bucket)
        .agg(_sum_value().alias("sum_value"), F.count("*").alias("n_points"))
        .withColumn("avg_value", F.col("sum_value") / F.col("n_points"))
        .select("signature", "bucket_ms", "avg_value", "n_points")
    )


@_q(
    "ts_latest",
    f"""
    SELECT signature, ts_ms, value FROM (
      SELECT {SIG_SQL} AS signature, epoch_ms(ts) AS ts_ms, value,
             row_number() OVER (
               PARTITION BY {SIG_SQL} ORDER BY epoch_ms(ts) DESC, value DESC
             ) AS rn
      FROM events
      WHERE epoch_ms(ts) BETWEEN {JAN1} AND {JAN20}
    ) WHERE rn = 1
    """,
)
def ts_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-vector: most recent point per series, deterministic
    tie-break (ts desc, value desc)."""
    s = events_samples(spark, sf_dir).filter(F.col("timestamp").between(JAN1, JAN20))
    return _latest(s, key_cols=["signature"]).select(
        "signature", F.col("timestamp").alias("ts_ms"), "value"
    )


@_q(
    "ts_label_values",
    "SELECT DISTINCT event_type AS value FROM events",
)
def ts_label_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus label_values API — distinct values of one label key
    (the reference's LR keyspace scan,
    /root/reference/src/indexer/sled_indexer.rs:23-25)."""
    s = events_samples(spark, sf_dir)
    return (
        s.select(F.try_element_at("labels", F.lit("event_type")).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )


@_q(
    "ts_neq_matcher",
    f"""
    SELECT {SIG_SQL} AS signature,
           count(*) AS n_points,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type <> 'error' AND epoch_ms(ts) BETWEEN {JAN3} AND {JAN15}
    GROUP BY 1
    """,
)
def ts_neq_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEQ matcher (M4 extension; proto carries it at
    /root/reference/src/proto/types.rs:1184-1189 but the reference
    collapses it to EQ)."""
    s = events_samples(spark, sf_dir).filter(
        matcher_predicate("labels", [LabelMatcher("event_type", "error", NEQ)])
    )
    return (
        s.filter(F.col("timestamp").between(JAN3, JAN15))
        .groupBy("signature")
        .agg(F.count("*").alias("n_points"), _sum_value().alias("sum_value"))
    )


@_q(
    "ts_regex_matcher",
    f"""
    SELECT {SIG_SQL} AS signature, count(*) AS n_points
    FROM events
    WHERE regexp_full_match(event_type, 'click|view')
      AND epoch_ms(ts) BETWEEN {JAN3} AND {JAN15}
    GROUP BY 1
    """,
)
def ts_regex_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE matcher, fully anchored (Prometheus semantics)."""
    s = events_samples(spark, sf_dir).filter(
        matcher_predicate("labels", [LabelMatcher("event_type", "click|view", RE)])
    )
    return (
        s.filter(F.col("timestamp").between(JAN3, JAN15))
        .groupBy("signature")
        .agg(F.count("*").alias("n_points"))
    )


@_q(
    "ts_delta_stats",
    f"""
    SELECT signature,
           CAST(sum(delta) AS DOUBLE) AS sum_delta,
           count(*) AS n_deltas
    FROM (
      SELECT {SIG_SQL} AS signature,
             CAST(value AS DECIMAL(28,6))
               - lag(CAST(value AS DECIMAL(28,6))) OVER (
                   PARTITION BY {SIG_SQL} ORDER BY epoch_ms(ts), value
                 ) AS delta
      FROM events
      WHERE epoch_ms(ts) BETWEEN {JAN1} AND {JAN20}
    ) WHERE delta IS NOT NULL
    GROUP BY 1
    """,
)
def ts_delta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate()-style consecutive deltas per series; DECIMAL diffs keep
    the sum order-independent."""
    s = events_samples(spark, sf_dir).filter(F.col("timestamp").between(JAN1, JAN20))
    w = Window.partitionBy("signature").orderBy("timestamp", "value")
    dec = F.col("value").cast("decimal(28,6)")
    return (
        s.select("signature", (dec - F.lag(dec).over(w)).alias("delta"))
        .filter(F.col("delta").isNotNull())
        .groupBy("signature")
        .agg(F.sum("delta").cast("double").alias("sum_delta"), F.count("*").alias("n_deltas"))
    )


# ------------------------------------------------------------------- TPC-H

@_q(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the generic aggregation layer the
    reference lacks entirely (SURVEY §2.4); exact DECIMAL arithmetic
    end-to-end."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            F.sum(disc).cast("double").alias("sum_disc"),
            F.count("*").alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@_q(
    "tpch_q3_top10",
    """
    SELECT o_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style join + top-k: broadcast the small dims, shuffle only
    lineitem once on the group key."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                .select("o_orderkey")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@_q(
    "tpch_nation_revenue",
    """
    SELECT r_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def tpch_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup: every dim broadcast, the fact shuffled once."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_q(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — windowed rank, single shuffle on the group key."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ------------------------------------------------------------------ registry

def all_queries() -> dict[str, WorkloadQuery]:
    return {q.name: q for q in _REGISTRY}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in _REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY if q.oracle is not None}
