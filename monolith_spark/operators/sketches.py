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

from pyspark.sql import Column, DataFrame, Window
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


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007 unbiased form): per group, the ``k`` smallest
    DISTINCT 60-bit key hashes — rows [*group_cols, h].

    The KMV estimate D̂ = (k−1)/U_(k) (U_(k) = k-th smallest hash
    normalized to [0,1)) has rsd ≈ 1/√(k−2); with fewer than k
    distinct keys the sketch holds every hash and the count is exact.
    Unlike HLL++ the whole construction is order-free and engine-
    portable (md5-derived hashes + a rank window), so the ESTIMATE
    itself is exactly reproducible cross-engine — the sketch entry
    with a full-strength value oracle, not a bound-check.

    Mergeable: union the [group, h] rows of partial sketches and
    re-take the k smallest per group (``kmv_merge``) — the result is
    exactly the sketch of the union, the property that lets partial
    sketches roll up across partitions/days at 100 TB. Scale shape:
    one distinct + one rank window per group (one exchange); sketch
    size is k rows per group regardless of cardinality.
    """
    d = df.select(
        *group_cols, hash60_expr(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(*sketches: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Union partial KMV sketches and re-take the k smallest per
    group — exactly the sketch of the unioned key sets."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    d = u.distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """[*group_cols, kmv_est] from a kmv_sketch: exact count below k,
    else (k−1)/U_(k). Two double divisions, bit-identical on any
    IEEE engine."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("__n"), F.max("h").alias("__hk")
    )
    est = (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            / (F.col("__hk").cast("double") / F.lit(float(1 << 60)))
        )
    )
    return agg.select(*group_cols, est.alias("kmv_est"))
