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


def kmv_pairwise_overlap(
    sketch: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set algebra on KMV sketches (Beyer et al. 2007 §5):
    for every unordered group pair (a < b), estimate |A∪B|, |A∩B| and
    the Jaccard similarity — from the sketches alone, never touching
    the raw keys again.

    The device: the k smallest hashes of A∪B are exactly the k
    smallest of sketch(A) ∪ sketch(B) (any union-hash below the cut
    is below its own group's cut too, so it IS in that group's
    sketch — membership flags read off the truncated sketches are
    exact). With ρ = |{h in merged-k : h ∈ A and h ∈ B}| / k:
    union ≈ (k−1)/U_(k), jaccard ≈ ρ, intersection ≈ ρ · union.
    Below k distinct union hashes everything is exact.

    Scale shape: inputs are ≤ k rows per group however large the key
    sets, so the pair stage is |groups|²·k rows of window + groupBy —
    negligible; the only corpus-scale work is building the sketches
    (one distinct + one WindowGroupLimit top-k). Sketches roll up
    across days/partitions first (kmv_merge), so the pairwise
    overlap of two 100 TB cohorts costs two sketch scans + this.
    All arithmetic is the same IEEE expression tree on any engine —
    the estimates themselves are exactly reproducible."""
    # Pairing T groups without a CartesianProduct (the registry plan
    # sweep forbids one, and Catalyst folds a constant equi-join key
    # back into a nested loop): collapse the group list to ONE array
    # row, broadcast it (the whitelisted 1-row BNLJ build, same device
    # as the k-means centroid row), and explode it next to each sketch
    # row — T output rows per sketch row, no join on the sketches.
    tys = sketch.groupBy().agg(
        F.sort_array(F.collect_set(F.col(group_col))).alias("__tys")
    )
    expanded = (
        sketch.select(F.col(group_col).alias("g"), "h")
        .crossJoin(F.broadcast(tys))
        .select("g", "h", F.explode("__tys").alias("o"))
    )
    a = expanded.filter(F.col("g") < F.col("o")).select(
        F.col("g").alias("ga"), F.col("o").alias("gb"), "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    b = expanded.filter(F.col("o") < F.col("g")).select(
        F.col("o").alias("ga"), F.col("g").alias("gb"), "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    tagged = a.unionByName(b)
    merged = tagged.groupBy("ga", "gb", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    agg = topk.groupBy("ga", "gb").agg(
        F.count("*").alias("__n"),
        F.max("h").alias("__hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("__both"),
    )
    exact = F.col("__n") < k
    union_est = F.when(exact, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.col("__hk").cast("double") / F.lit(float(1 << 60)))
    )
    jaccard = F.when(exact, F.col("__both").cast("double") / F.col("__n")).otherwise(
        F.col("__both").cast("double") / F.lit(float(k))
    )
    return agg.select(
        F.col("ga").alias(f"{group_col}_a"),
        F.col("gb").alias(f"{group_col}_b"),
        union_est.alias("union_est"),
        (jaccard * union_est).alias("inter_est"),
        jaccard.alias("jaccard_est"),
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
