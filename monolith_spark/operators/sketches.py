"""Count-min sketch: bounded-state frequency estimation.

The scale story: an exact token count is an unbounded-vocabulary
groupBy — at 100 TB the long tail of the vocabulary dominates shuffle
volume and reducer state. A count-min sketch caps state at depth×width
counters regardless of input: each update increments one bucket per
depth row, the aggregation is a map-combinable groupBy on (d, bucket)
whose output is a few KB, and sketches from different partitions /
days / sources MERGE by adding counters (the property HLL and GK give
for distinct counts and quantiles; this completes the trio for
frequencies). Estimates are upper bounds: est(x) = min over rows of
counter[d][h_d(x)] ≥ true(x), within ε·N with probability 1−δ for
width = e/ε, depth = ln(1/δ) (Cormode & Muthukrishnan 2005).

Hashing is the 60-bit md5 prefix of "d:key" mod width — deterministic
and engine-portable, so a DuckDB oracle can replay the sketch
bit-for-bit (unlike percentile_approx/HLL whose merge internals are
Spark-private, forcing rows-only checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monolith_spark.operators.text import hash60_expr


def cms_bucket_expr(key: Column, d: int, width: int) -> Column:
    """Depth-d bucket of a key: hash60(md5("d:key")) mod width."""
    return hash60_expr(F.concat(F.lit(f"{d}:"), key)) % width


def cms_sketch(
    df: DataFrame, key_col: str = "key", depth: int = 3, width: int = 1024
) -> DataFrame:
    """Build the sketch: [d, bucket, n] with exactly one row per
    touched counter (≤ depth·width rows total, whatever the input).

    The depth expansion is a narrow explode of a literal array; the
    single shuffle is the (d, bucket) groupBy with map-side partials —
    reducer state is bounded by the sketch size, not the key
    cardinality."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket_expr(F.col(key_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    )
    return (
        rows.groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each key: est = min over depth rows
    of the key's counter (missing counter ⇒ 0). The sketch side is
    ≤ depth·width rows — always broadcastable — so the probe is a
    broadcast join however large the key set."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket_expr(F.col(key_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(key_col, F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches by summing counters — the distributed-rollup
    property (per-partition / per-day sketches add up exactly)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("n").alias("n"))
