"""Accuracy bounds for the sketch-based (rows-only) workload queries:
sketches can't hash-match an oracle, so their contract is a bounded
error against the exact computation on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from monolith_spark.sources.events import events_samples
from monolith_spark.workload import JAN1, JAN20, DAY_MS, all_queries


def test_approx_quantiles_rank_error_bounded(spark, sf_dir):
    # GK sketch guarantee: the returned element's true rank is within
    # eps*n of the target rank (eps = 1/accuracy = 1e-4, i.e. exact at
    # fixture scale up to ties). Verify via empirical CDF over the
    # SERVING-tier sketch aggregation (the workload query wraps this in
    # its hash-matchable verdict form — its booleans are asserted too).
    approx = {
        r["signature"]: r
        for r in events_samples(spark, sf_dir, ts_range=(JAN1, JAN20))
        .groupBy("signature")
        .agg(F.percentile_approx("value", [0.5, 0.9], 10_000).alias("ap"))
        .select(
            "signature",
            F.col("ap")[0].alias("p50_approx"),
            F.col("ap")[1].alias("p90_approx"),
        )
        .collect()
    }
    exact = (
        events_samples(spark, sf_dir, ts_range=(JAN1, JAN20))
        .groupBy("signature")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    )
    assert approx and len(exact) == len(approx)
    for row in exact:
        vals, got = row["vals"], approx[row["signature"]]
        n = len(vals)
        for q, p in ((0.5, got["p50_approx"]), (0.9, got["p90_approx"])):
            lo = sum(1 for v in vals if v < p)
            hi = sum(1 for v in vals if v <= p)
            assert lo <= q * n + 1, (row["signature"], q, p, lo, n)
            assert hi >= q * n - 1, (row["signature"], q, p, hi, n)
    verdict = all_queries()["ts_approx_quantiles"].spark_fn(spark, sf_dir).collect()
    assert verdict and all(r["p50_ok"] and r["p90_ok"] for r in verdict)


def test_hll_daily_users_within_rsd(spark, sf_dir):
    rows = all_queries()["events_hll_daily_users"].spark_fn(spark, sf_dir).collect()
    assert rows and all(r["hll_within_rsd"] for r in rows)
    got = {r["day"]: r["exact_users"] for r in rows}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.expr("unix_millis(CAST(ts AS TIMESTAMP))").alias("ts_ms")
    )
    exact = {
        r["day"]: r["n"]
        for r in ev.filter(F.col("ts_ms").between(JAN1, JAN20))
        .groupBy((F.col("ts_ms") / F.lit(DAY_MS)).cast("long").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # the query's exact_users column must be truly exact
    assert got == exact and got


def test_cms_upper_bound_and_merge(spark, sf_dir):
    """CMS contracts: est >= true for EVERY key (not just heavy
    hitters); per-partition sketches merge by addition to exactly the
    whole-corpus sketch; sketch size is bounded by depth*width."""
    from monolith_spark.operators import sketches as sk
    from monolith_spark.operators.text import tokens_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens_expr("text")).alias("tok"))
    sketch = sk.cms_sketch(toks, "tok", depth=3, width=256)
    assert sketch.count() <= 3 * 256

    exact = toks.groupBy("tok").agg(F.count("*").alias("true_n"))
    est = sk.cms_estimate(sketch, exact.select("tok"), "tok", depth=3, width=256)
    joined = exact.join(est, "tok")
    assert joined.filter(F.col("cms_n") < F.col("true_n")).count() == 0

    # merge = sum of counters: split the corpus in half and re-merge
    a = sk.cms_sketch(
        toks.filter(F.crc32(F.col("tok")) % 2 == 0), "tok", depth=3, width=256
    )
    b = sk.cms_sketch(
        toks.filter(F.crc32(F.col("tok")) % 2 == 1), "tok", depth=3, width=256
    )
    merged = {(r["d"], r["bucket"]): r["n"] for r in sk.cms_merge(a, b).collect()}
    whole = {(r["d"], r["bucket"]): r["n"] for r in sketch.collect()}
    assert merged == whole


def test_kmv_estimate_accuracy_and_exact_below_k(spark):
    from monolith_spark.operators.sketches import kmv_estimate, kmv_sketch

    rows = [("g1", f"user{i}") for i in range(1000)] + [
        ("g2", f"u{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    sk = kmv_sketch(df, "key", ["grp"], k=64)
    est = {r["grp"]: r["kmv_est"] for r in kmv_estimate(sk, ["grp"], k=64).collect()}
    assert est["g2"] == 20.0                         # below k: exact
    assert abs(est["g1"] - 1000) / 1000 < 0.4        # ~3x rsd at k=64
    # sketch is k rows per group regardless of cardinality
    sizes = {r["grp"]: r["n"] for r in sk.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"g1": 64, "g2": 20}


def test_kmv_merge_equals_union_sketch(spark):
    from monolith_spark.operators.sketches import kmv_merge, kmv_sketch

    a = spark.createDataFrame([("g", f"x{i}") for i in range(300)], "grp string, key string")
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(200, 500)], "grp string, key string"
    )
    merged = kmv_merge(
        kmv_sketch(a, "key", ["grp"]), kmv_sketch(b, "key", ["grp"]),
        group_cols=["grp"],
    )
    direct = kmv_sketch(a.unionByName(b), "key", ["grp"])
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_pairwise_overlap_exact_below_k_and_estimate(spark):
    from monolith_spark.operators.sketches import kmv_pairwise_overlap, kmv_sketch

    # Small groups (below k): union/intersection/jaccard are exact.
    rows = (
        [("A", f"x{i}") for i in range(30)]          # A = x0..x29
        + [("B", f"x{i}") for i in range(20, 50)]    # B = x20..x49, |A∩B|=10
        + [("C", f"y{i}") for i in range(5)]         # C disjoint from both
    )
    df = spark.createDataFrame(rows, "grp string, key string")
    sk = kmv_sketch(df, "key", ["grp"], k=64)
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_pairwise_overlap(sk, "grp", k=64).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab["union_est"] == 50.0
    assert abs(ab["inter_est"] - 10.0) < 1e-9
    assert abs(ab["jaccard_est"] - 0.2) < 1e-12
    assert out[("A", "C")]["inter_est"] == 0.0
    assert out[("B", "C")]["jaccard_est"] == 0.0

    # Above k: the estimate tracks the true union within sketch rsd,
    # and the membership flags stay exact (the k smallest union hashes
    # are always inside their own group's k-truncated sketch).
    big = (
        [("P", f"k{i}") for i in range(2000)]
        + [("Q", f"k{i}") for i in range(1000, 3000)]
    )
    bsk = kmv_sketch(spark.createDataFrame(big, "grp string, key string"),
                     "key", ["grp"], k=64)
    pq = kmv_pairwise_overlap(bsk, "grp", k=64).collect()[0]
    assert abs(pq["union_est"] - 3000) / 3000 < 0.5   # ~4x rsd at k=64
    true_j = 1000 / 3000
    assert abs(pq["jaccard_est"] - true_j) < 0.2
