"""Physical-plan assertions — the 100 TB contract, enforced:
filters reach the parquet scan, chunk partitions prune, dims broadcast
(the fact table is never sort-merge shuffled), scans read only the
columns the query needs."""

from __future__ import annotations

import pytest

from monolith_spark.engine import MonolithDB
from monolith_spark.workload import all_queries


@pytest.fixture(autouse=True)
def _full_metadata(spark):
    # plan toString truncates filter lists at 100 chars by default
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    yield
    spark.conf.set("spark.sql.maxMetadataStringLength", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _final_plan(df) -> str:
    # AQE replans at runtime; execute THIS DataFrame's QueryExecution
    # (a noop write would spawn its own) so the final plan (with
    # codegen stages) is what we inspect.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_ts_superset_eq_pushes_matcher_and_range(spark, sf_dir):
    plan = _plan(all_queries()["ts_superset_eq"].spark_fn(spark, sf_dir))
    scan = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    # matcher equality + raw-timestamp range must reach the scan
    # (range is [start, end+1ms) on the TIMESTAMP_NTZ column)
    assert "EqualTo(event_type,purchase)" in scan
    assert "GreaterThanOrEqual(ts," in scan and "LessThan(ts," in scan


def test_engine_query_prunes_partitions_and_broadcasts(spark, tmp_path):
    db = MonolithDB(spark, str(tmp_path / "db"), chunk_size_ms=60_000)
    df = spark.createDataFrame(
        [({"j": "a"}, t, 1.0) for t in (1_000, 61_000, 121_000, 181_000)],
        "labels map<string,string>, timestamp long, value double",
    )
    db.write(df)
    q = db.query_flat({"j": "a"}, 60_000, 120_000)
    plan = _plan(q)
    # chunk pruning (the reference's overlap check as partition filters)
    assert "PartitionFilters: [isnotnull(chunk_id" in plan
    assert "(chunk_id" in plan and ">= 1" in plan and "<= 2" in plan
    # timestamp trim pushed to parquet row groups
    assert "GreaterThanOrEqual(timestamp,60000)" in plan
    # dim join is broadcast; the fact side is never shuffle-sorted
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(all_queries()["tpch_nation_revenue"].spark_fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q1_scan_prunes_columns(spark, sf_dir):
    plan = _plan(all_queries()["tpch_q1"].spark_fn(spark, sf_dir))
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    schema = scan.split("ReadSchema: ")[1]
    # 7 of 11 lineitem columns; notably l_orderkey/l_partkey excluded
    assert "l_orderkey" not in schema
    assert "l_quantity" in schema and "l_shipdate" in schema


@pytest.mark.slow
def test_approx_similarity_plans_avoid_cartesian(spark, sf_dir):
    # The all-pairs/brute-force variants are allowed a nested-loop join
    # (they are oracles); the LSH/IVF scale paths must be pure equi-join
    # blocking — no cartesian, no broadcast-nested-loop.
    from pyspark.sql import functions as F

    from monolith_spark.operators import dedup, similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = embs.filter(F.col("vec_id") < 4).withColumnRenamed("vec_id", "query_id")
    scale_paths = {
        "lsh_topk": similarity.lsh_topk(embs, queries, k=5),
        "ivf_topk": similarity.ivf_topk(embs, queries, k=5, nlist=4, nprobe=2),
        "ivfpq_topk": similarity.ivfpq_topk(
            embs, queries, k=5, nlist=4, nprobe=2, m=8, ksub=8
        ),
        "near_dup_lsh": similarity.embedding_near_dup_lsh(embs),
        "minhash_lsh": dedup.minhash_lsh_pairs(docs),
        "simhash": dedup.simhash_pairs(docs),
    }
    scale_paths["range_join"] = all_queries()["ts_range_join_windows"].spark_fn(spark, sf_dir)
    scale_paths["asof_join"] = all_queries()["ts_asof_join"].spark_fn(spark, sf_dir)
    for name, df in scale_paths.items():
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_whole_stage_codegen_active(spark, sf_dir):
    plan = _final_plan(all_queries()["tpch_q1"].spark_fn(spark, sf_dir))
    # whole-stage codegen renders as "*(n)" stage markers in the tree
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan and "*(2)" in plan


def test_new_query_plans_stay_equi_join(spark, sf_dir):
    # Q5: dims broadcast, never a cartesian/NLJ; the fact-fact join may
    # be broadcast at fixture scale (AQE) but must be an equi-join.
    # dedup_clusters is excluded: cluster_pairs returns an eagerly
    # localCheckpoint-ed result whose plan is a Scan ExistingRDD — a
    # plan assertion on it would be vacuous (and run the whole job).
    names = ["tpch_q5_local_supplier", "tpch_brand_returns",
             "ts_resample_gapfill", "ts_moving_avg"]
    for name in names:
        plan = _plan(all_queries()[name].spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    q5 = _plan(all_queries()["tpch_q5_local_supplier"].spark_fn(spark, sf_dir))
    assert q5.count("BroadcastHashJoin") >= 3


def test_moving_avg_matcher_reaches_scan(spark, sf_dir):
    plan = _plan(all_queries()["ts_moving_avg"].spark_fn(spark, sf_dir))
    scan = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "EqualTo(event_type,view)" in scan


def test_single_agg_families_avoid_window_and_sort(spark, sf_dir):
    qs = all_queries()
    # deriv: five accumulators in ONE map-combinable aggregation — a
    # window or sort here would mean the cheap path regressed
    plan = _plan(qs["ts_deriv"].spark_fn(spark, sf_dir))
    assert "PushedFilters" in plan and "Window" not in plan, plan[:1500]
    # GK sketch quantiles (serving tier — the workload query adds a
    # verify join): hash aggregation of sketch partials, never a
    # sort-based agg over raw values
    from pyspark.sql import functions as F

    from monolith_spark.sources.events import events_samples
    from monolith_spark.workload import JAN1, JAN20

    sketch = (
        events_samples(spark, sf_dir, ts_range=(JAN1, JAN20))
        .groupBy("signature")
        .agg(F.percentile_approx("value", [0.5, 0.9], 10_000).alias("ap"))
    )
    plan = _plan(sketch)
    assert "Window" not in plan and "SortAggregate" not in plan, plan[:1500]
    # histogram quantile: join-free — bucket grid agg + window over the
    # (tiny) histogram, the raw scan feeds exactly one aggregation
    plan = _plan(qs["ts_histogram_quantile"].spark_fn(spark, sf_dir))
    assert "Join" not in plan and "PushedFilters" in plan, plan[:1500]


def test_setop_plans_reduce_before_joining(spark, sf_dir):
    # INTERSECT/EXCEPT must plan as distinct-aggregate + equi-join —
    # never a nested loop, and the join operands are the distinct user
    # sets, not raw events
    for name in ("events_retention", "events_churned"):
        plan = _plan(all_queries()[name].spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "HashAggregate" in plan, name


def test_analytics_joins_stay_equi_and_grouped(spark, sf_dir):
    # cohort / vector-ratio / WoW / curation: every join must be an
    # equi-join (no nested loop), and the join inputs must be
    # aggregated/grouped rows, visible as HashAggregate below the join
    for name in ("events_cohort_retention", "ts_vector_ratio",
                 "ts_wow_change", "docs_curation", "docs_decontaminate",
                 "ts_max_daily_increase"):
        plan = _plan(all_queries()[name].spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # pivot: no join, and one shuffle — Spark pre-aggregates
    # (day, event_type) map-side, then pivotfirst over a single
    # day-keyed exchange
    plan = _plan(all_queries()["events_type_pivot"].spark_fn(spark, sf_dir))
    assert "Join" not in plan and plan.count("Exchange") == 1, plan[:1500]


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides written CLUSTERED BY the join key with the same
    bucket count -> the sort-merge join runs with ZERO Exchange (the
    scan's bucket spec satisfies the join's required distribution).
    At 100 TB this is the layout for recurring fact-fact joins."""
    from monolith_spark.plans.bucketing import bucket_spec, write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    line = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wh = str(tmp_path)
    write_bucketed(orders, "b_orders", f"{wh}/b_orders", ["o_orderkey"], buckets=8)
    write_bucketed(
        line, "b_lineitem", f"{wh}/b_lineitem", ["l_orderkey"], buckets=8,
        sort_cols=["l_orderkey"],
    )
    try:
        assert bucket_spec(spark, "b_orders") == (8, ["o_orderkey"])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table("b_orders")
                .join(
                    spark.table("b_lineitem"),
                    spark.table("b_orders").o_orderkey
                    == spark.table("b_lineitem").l_orderkey,
                )
                .groupBy("o_orderkey")
                .count()
            )
            plan = _final_plan(j)
            assert "Exchange" not in plan, plan[:2000]
            assert "SortMergeJoin" in plan
            # the groupBy keys on the bucket column too: no shuffle for
            # the aggregate either
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_q19_envelope_conjuncts_reach_both_scans(spark, sf_dir):
    # The OR-of-ANDs itself can't push, but its derived per-side
    # envelopes must: quantity range on lineitem, brand-IN + size
    # range on part. The residual disjunction rides the join.
    plan = _plan(all_queries()["tpch_q19_disjunctive"].spark_fn(spark, sf_dir))
    scans = [l for l in plan.splitlines() if "PushedFilters" in l]
    li_scan = [l for l in scans if "l_quantity" in l][0]
    p_scan = [l for l in scans if "p_brand" in l][0]
    assert "GreaterThanOrEqual(l_quantity,1.0)" in li_scan
    assert "LessThanOrEqual(l_quantity,40.0)" in li_scan
    assert "In(p_brand" in p_scan and "LessThanOrEqual(p_size,35)" in p_scan


def test_q21_decorrelates_without_expand_or_self_join_probe(spark, sf_dir):
    # The EXISTS / NOT-EXISTS pair must become ONE per-order aggregate:
    # no Expand (the multi-countDistinct plan), no left-semi/anti
    # probes of the fact table, everything an equi-join.
    plan = _plan(
        all_queries()["tpch_q21_sole_return_supplier"].spark_fn(spark, sf_dir)
    )
    assert "Expand" not in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_max_revenue_is_broadcast_not_window(spark, sf_dir):
    # 'equals the global max' must come from a broadcast 1-row agg,
    # never a Window over a single partition (which would serialize
    # the whole per-supplier aggregate through one task).
    plan = _plan(all_queries()["tpch_q15_top_supplier"].spark_fn(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_q10_topk_avoids_global_sort(spark, sf_dir):
    # ORDER BY + LIMIT plans TakeOrderedAndProject (per-partition
    # heaps + driver merge), not a full Sort+Exchange of the aggregate.
    plan = _plan(all_queries()["tpch_q10_returned_top"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q7_q8_dims_broadcast(spark, sf_dir):
    # Region/nation/supplier/part legs are broadcast; shuffles are
    # reserved for the lineitem⋈orders⋈customer fact joins.
    for name, min_bcast in [
        ("tpch_q7_volume_shipping", 3),
        ("tpch_q8_market_share", 4),
    ]:
        plan = _plan(all_queries()[name].spark_fn(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= min_bcast, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_window_suite_one_exchange(spark, sf_dir):
    # Both windows partition by o_custkey — Spark must plan ONE
    # hash-partition exchange and re-sort within partitions, never a
    # second shuffle for the second ordering.
    plan = _plan(all_queries()["orders_window_suite"].spark_fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_groupingsets_single_pass(spark, sf_dir):
    # Independent margins via GROUPING SETS: one Expand feeding one
    # aggregation — the fact is scanned once, not once per margin.
    plan = _plan(
        all_queries()["tpch_groupingsets_margins"].spark_fn(spark, sf_dir)
    )
    assert plan.count("Expand") == 1


def test_new_tpch_shape_plans(spark, sf_dir):
    qs = all_queries()
    # Q2/Q12/Q16/Q20: equi-joins only — dims broadcast, no NLJ.
    for name in ("tpch_q2_min_cost_supplier", "tpch_q12_priority_by_month",
                 "tpch_q16_supplier_count",
                 "tpch_q20_part_promotion_suppliers"):
        plan = _plan(qs[name].spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # Q16: the NOT-IN must plan a broadcast anti-join, and the distinct
    # supplier count over pre-distinct pairs must not need Expand.
    q16 = _plan(qs["tpch_q16_supplier_count"].spark_fn(spark, sf_dir))
    assert "LeftAnti" in q16 and "BroadcastHashJoin" in q16
    assert "Expand" not in q16
    # Q20: nested-IN becomes a left-semi into supplier; the date range
    # prunes the fact scan.
    q20 = _plan(qs["tpch_q20_part_promotion_suppliers"].spark_fn(spark, sf_dir))
    assert "LeftSemi" in q20
    assert any("PushedFilters" in l and "l_shipdate" in l
               for l in q20.splitlines())
    # Q11: the grand-total side is a broadcast 1-row aggregate — the
    # only acceptable nested-loop shape (1 row × per-part agg); the
    # fact-sized work must still be hash-aggregated, not cartesian.
    q11 = _plan(qs["tpch_q11_important_parts"].spark_fn(spark, sf_dir))
    assert "CartesianProduct" not in q11
    assert "HashAggregate" in q11
    # Q22: the scalar-aggregate side broadcasts (1 row), the anti probe
    # is date-pruned at the orders scan, and no cartesian appears
    # despite the scalar cross join.
    q22 = _plan(qs["tpch_q22_global_sales_opportunity"].spark_fn(spark, sf_dir))
    assert "LeftAnti" in q22
    assert "CartesianProduct" not in q22
    assert any("PushedFilters" in l and "o_orderdate" in l for l in q22.splitlines())


def test_range_func_by_step_two_exchanges(spark, sf_dir):
    # rate/increase per step bucket: ONE sort exchange for the per-series
    # window, ONE hash exchange for the (series, bucket) agg — and the
    # agg must be partial (map-side combine) before its shuffle.
    from monolith_spark.operators.timeseries import range_func_by_step
    from monolith_spark.sources.events import events_samples

    s = events_samples(spark, sf_dir)
    plan = _plan(range_func_by_step(s, 86_400_000, "rate", key_cols=["signature"]))
    # ONE exchange total: hashpartitioning(signature) for the window
    # also satisfies the (signature, bucket) agg's clustering, so the
    # agg reuses the same partitioning instead of reshuffling.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan  # map-side combine ahead of the shuffle
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_multimodal_decode_is_narrow_map(spark, sf_dir):
    # decode→resize→features must be a shuffle-free narrow map: payloads
    # cross into Python via Arrow once, and nothing repartitions them.
    plan = _plan(all_queries()["multimodal_decode_stats"].spark_fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 2  # synth payloads + decode stage


def test_minhash_signatures_single_shuffle_no_seed_explode(spark, sf_dir):
    # Universal-hash minhashes: the ONLY exchange is the (doc) groupBy;
    # the k transforms stay map-side (no 16× seed explode stage), and
    # the agg combines map-side before shuffling.
    import pyspark.sql.functions as F

    from monolith_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(minhash_signatures(docs))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Generate explode") == 1  # shingles only, not seeds
    assert "partial_min" in plan


def test_salted_assembly_two_stage_exchanges(spark, tmp_path):
    # The salted collect must shuffle per-(series, salt) partials first,
    # then one array-row-per-salt merge — two exchanges, no more.
    from monolith_spark.operators.timeseries import to_timeseries_salted

    df = spark.createDataFrame(
        [(1, t, float(t)) for t in range(10)],
        "series_id long, timestamp long, value double",
    )
    plan = _plan(to_timeseries_salted(df, salt=4))
    assert plan.count("Exchange hashpartitioning") == 2
    # stage 1 collects per-(series, salt), stage 2 merges array rows —
    # both with map-side partials
    assert "partial_collect_list(struct(timestamp" in plan
    assert "partial_collect_list(partial" in plan


def test_mad_outliers_single_exchange(spark, sf_dir):
    # Every window (rank, count, median sums, MAD sums) and the final
    # groupBy share hashpartitioning(signature) — one exchange total.
    from monolith_spark.workload import all_queries

    plan = _plan(all_queries()["ts_mad_outliers"].spark_fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_keep_best_singletons_anti_join_not_forced_broadcast(spark, sf_dir):
    # The singleton path is an ANTI join against the cluster node set.
    # It must NOT carry a forced broadcast hint (the node set is
    # O(corpus) on high-dup-rate crawls — a hint OOMs at scale); the
    # broadcast decision belongs to AQE's measured-size gate. At
    # fixture scale that gate SHOULD fire: the final adaptive plan
    # shows a BroadcastHashJoin anti, proving small-side perf is kept.
    from monolith_spark.workload import all_queries

    df = all_queries()["docs_dedup_keep_best"].spark_fn(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical, logical
    # AdaptiveSparkPlan.toString appends the pre-adaptive "Initial
    # Plan" — only the final section shows what actually ran.
    plan = _final_plan(df).split("== Initial Plan ==")[0]
    anti = [l for l in plan.splitlines() if "Join" in l and "LeftAnti" in l]
    assert anti and all("BroadcastHashJoin" in l for l in anti), anti


def test_dedup_plans_have_no_forced_broadcast(spark, sf_dir):
    # dedup joins touch O(corpus) relations (per-doc shingle counts,
    # cluster node sets) — none may be hint-broadcast; AQE decides from
    # measured sizes (VERDICT r2 item 2).
    from monolith_spark.operators import dedup, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for name, df in {
        "jaccard": dedup.shingle_jaccard_pairs(docs, threshold=0.5),
        "minhash_lsh": dedup.minhash_lsh_pairs(docs),
        "simhash": dedup.simhash_pairs(docs),
        # all-pairs cosine baseline: the theta-join side is O(corpus
        # vectors) — auto-broadcast under the stats threshold is fine,
        # a forced hint is not.
        "embedding_pairs": similarity.embedding_near_dup_pairs(embs),
    }.items():
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical, (name, logical)


def test_simhash_caps_flooded_block(spark):
    # One hot block (identical boilerplate) must not produce |block|²
    # pairs: with cap=4, ten identical docs pair only among the first
    # four doc_ids — C(4,2)=6 pairs, all hamming 0.
    from monolith_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated for every document here")
         for i in range(10)],
        "doc_id long, text string",
    )
    rows = simhash_pairs(docs, max_block_size=4).collect()
    assert len(rows) == 6, rows
    assert all(r.hamming == 0 and r.doc_a < r.doc_b <= 3 for r in rows), rows


def test_jaccard_pairs_single_shingle_shuffle_no_self_join(spark, sf_dir):
    # Postings-list form: the exploded shingle table crosses exactly
    # ONE hashpartitioning exchange (groupBy shingle); pair generation
    # is an explode over each posting, so the plan has no nested-loop
    # join anywhere. The per-doc size joins are unhinted equi-joins
    # (AQE broadcasts them at runtime when measured small).
    from monolith_spark.operators.dedup import shingle_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(shingle_jaccard_pairs(docs, threshold=0.5))
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    shingle_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(shingle" in l
    ]
    assert len(shingle_exchanges) == 1, shingle_exchanges


def test_domain_cap_partial_window_group_limit(spark, sf_dir):
    # The rn<=15 cap must push a partial WindowGroupLimit BELOW the
    # source exchange: the shuffle then carries <=15 rows per (source,
    # map task) instead of the corpus.
    plan = _plan(all_queries()["docs_domain_cap"].spark_fn(spark, sf_dir))
    lines = plan.splitlines()
    first_exchange = next(i for i, l in enumerate(lines) if "Exchange" in l)
    assert any("WindowGroupLimit" in l for l in lines[first_exchange:]), plan[:2000]


def test_round3_pipeline_plans_avoid_cartesian(spark, sf_dir):
    """Round-3 operators' scale contracts at the plan level: every
    pair/probe stage is equi-join blocking — no cartesian, no
    broadcast-nested-loop anywhere in the composed plans."""
    from pyspark.sql import functions as F

    from monolith_spark.operators import dedup, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # kmeans-based plans contain ONE intentional bounded nested-loop:
    # the corpus x k-row centroid broadcast (k·dim literal doubles —
    # kmeans_lloyd's documented assignment shape). Everything else
    # must be pure equi-join blocking.
    kmeans_based = {"semdedup", "d4_prune"}
    plans = {
        "span_dedup": dedup.span_dup_stats(docs),
        "tf_cosine": dedup.shingle_tf_cosine_pairs(docs),
        "containment": dedup.shingle_containment_pairs(docs),
        "semdedup": similarity.semdedup(embs, k=4, iters=1),
        "d4_prune": similarity.d4_prune(embs, k=4, iters=1),
        "prototypicality": similarity.prototypicality(embs),
        "curation_full": all_queries()["docs_curation_full"].spark_fn(spark, sf_dir),
    }
    for name, df in plans.items():
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        if name not in kmeans_based:
            assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.slow
def test_registry_plan_red_flag_sweep(spark, sf_dir):
    """EVERY registry query's physical plan, swept for the 100 TB
    red flags: CartesianProduct, row-at-a-time Python UDFs
    (BatchEvalPython — the only sanctioned Python paths are Arrow
    mapInPandas for media decode), and any BroadcastNestedLoopJoin
    whose build side is more than a 1-row global aggregate, plus any
    Exchange SinglePartition over unbounded input (global windows /
    sorts — the VERDICT r3/r4 scale-killer class; bounded shapes like
    top-k-then-rank, 1-row aggregates and driver tables are
    whitelisted via _BOUNDED_MARKERS). The two documented all-pairs
    baselines and the bounded-query-set ANN probes are the only named
    exemptions; everything else must stay equi-join blocking. This is
    the regression guard for the bug classes VERDICT r2 (forced
    O(corpus) broadcasts) and r4 (single-partition windows) flagged."""
    # build sides that are legitimately larger than one row:
    #  - dedup_embedding_pairs / sim_topk_cosine: documented all-pairs
    #    verify/baseline tier (corpus side, auto- not hint-broadcast)
    #  - sim_ivf_topk / sim_pq_topk / docs_semantic_search: the
    #    bounded query set (q rows)
    bnlj_exempt = {
        "dedup_embedding_pairs", "sim_topk_cosine", "sim_ivf_topk", "sim_pq_topk",
        "sim_jl_ivf_topk", "sim_jl_ivf_indexed", "sim_ivf_appended",
        "docs_semantic_search",
        "docs_semantic_search_ivf",
        # bounded 8×32 probe-pair set (verify tier, like the ANN probes)
        "emb_jl_distortion", "emb_jl_ann",
    }

    failures = []
    for name, q in all_queries().items():
        df = q.spark_fn(spark, sf_dir)
        plan = _plan(df)
        if "CartesianProduct" in plan:
            failures.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            failures.append((name, "BatchEvalPython (row-wise Python UDF)"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_exempt:
            for side in _bnlj_build_sides_not_one_row(plan):
                failures.append((name, f"BNLJ build side not a 1-row aggregate: {side}"))
        for sub in _unbounded_single_partition_subtrees(plan):
            failures.append((name, f"Exchange SinglePartition over unbounded input: {sub}"))
        mx = _max_same_file_scans(plan)
        if mx > _MAX_SAME_FILE_SCANS:
            failures.append(
                (name, f"same source scanned {mx}x — duplicate-lineage"
                       " recomputation (checkpoint the shared stage)")
            )
    assert not failures, failures


# Highest legitimate same-source scan multiplicity in the registry:
# fixed-round unrolled iterations (emb_kmeans_lloyd: 2 Lloyd rounds ×
# assign+means) and multi-feature passes (docs_source_copy_matrix) top
# out at 8. Anything above is the duplicate-lineage class this guard
# exists for — docs_pagerank re-scanned the corpus 42× and
# docs_curation/the LSH blockers 16× before the round-6 checkpoint /
# one-scan fixes.
_MAX_SAME_FILE_SCANS = 8


def _max_same_file_scans(plan: str) -> int:
    import re
    from collections import Counter

    locs = re.findall(r"Location: InMemoryFileIndex\(\d+ paths?\)\[([^\]]*)", plan)
    return max(Counter(locs).values(), default=0)


# Markers that bound an Exchange SinglePartition's input to a driver-safe
# row count: a limit (the sanctioned top-k-then-rank pattern), a global
# 1-row aggregate, or a driver-created local table. A global window /
# sort over anything else funnels the whole relation through ONE task —
# the VERDICT r3/r4 scale-killer class (corpus-wide ntile et al.), fixed
# by operators/ranking.py's histogram-offset device.
_BOUNDED_MARKERS = (
    "LocalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
    "HashAggregate(keys=[]",
    "SortAggregate(key=[]",
    "LocalTableScan",
    "Scan ExistingRDD",
)


def _unbounded_single_partition_subtrees(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        indent = ln.index("Exchange")
        sub = []
        for j in range(i + 1, len(lines)):
            stripped = lines[j].lstrip(" :+-")
            ind_j = len(lines[j]) - len(stripped)
            if ind_j <= indent:
                break
            sub.append(lines[j])
        if not any(m in s for m in _BOUNDED_MARKERS for s in sub):
            bad.append((sub[0] if sub else ln).strip()[:100])
    return bad


def test_single_partition_guard_catches_global_window(spark, sf_dir):
    """The guard itself must fire on the bug class it exists for: a
    global (no partitionBy) window over an unbounded aggregate — the
    exact shape docs_perplexity_buckets / orders_rfm_segments /
    tpch_revenue_pareto had before operators/ranking.py."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    offender = agg.select(
        "o_custkey",
        F.ntile(3).over(Window.orderBy(F.col("n").desc(), "o_custkey")).alias("b"),
    )
    assert _unbounded_single_partition_subtrees(_plan(offender)), (
        "guard failed to flag a global-window plan"
    )
    # and a bounded top-k rank must NOT be flagged
    topk = o.orderBy(F.col("o_totalprice").desc()).limit(10)
    ranked = topk.select(
        "o_orderkey",
        F.row_number()
        .over(Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey"))
        .alias("rnk"),
    )
    assert not _unbounded_single_partition_subtrees(_plan(ranked))


def _bnlj_build_sides_not_one_row(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange IdentityBroadcastMode" not in ln:
            continue
        indent = len(ln) - len(ln.rstrip()) + ln.index("BroadcastExchange")
        sub = []
        for j in range(i + 1, len(lines)):
            stripped = lines[j].lstrip(" :+-")
            ind_j = len(lines[j]) - len(stripped)
            if ind_j <= indent:
                break
            sub.append(lines[j])
        if not any("HashAggregate(keys=[]" in s for s in sub):
            bad.append(ln.strip()[:100])
    return bad


def test_semantic_search_broadcasts_topk_not_corpus(spark, sf_dir):
    """ADVICE r5: the metadata-attach join must build on the q×k top-k
    relation, never the corpus-proportional filtered-docs relation —
    a forced O(corpus) broadcast is the r2-guard class."""
    q = all_queries()["docs_semantic_search"].spark_fn(spark, sf_dir)
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    meta_joins = [
        ln for ln in opt.splitlines()
        if "Join Inner, (neighbor_id" in ln
    ]
    assert len(meta_joins) == 1
    # left subtree = top-k (holds the rank window); the ONLY forced
    # hint on this join is a LEFT broadcast
    assert "leftHint=(strategy=broadcast)" in meta_joins[0]
    assert "rightHint" not in meta_joins[0]
    phys = [
        ln for ln in _plan(q).splitlines()
        if "BroadcastHashJoin [neighbor_id" in ln
    ]
    assert phys and all("BuildLeft" in ln for ln in phys)


def test_query_downsampled_prunes_and_broadcasts(spark, tmp_path):
    """The cross-tier step query: the raw side keeps chunk partition
    pruning, the matched dim semi-join broadcasts, no sort-merge join
    and no single-partition exchange anywhere."""
    from monolith_spark.labels import SAMPLES_SCHEMA

    db = MonolithDB(spark, str(tmp_path / "db"), chunk_size_ms=10_000)
    rows = [({"j": "a"}, t, 1.0) for t in (1_000, 11_000, 21_000, 31_000)]
    db.write(spark.createDataFrame(rows, SAMPLES_SCHEMA))
    db.downsample_retention(cutoff_ms=20_000, step_ms=5_000)

    q = db.query_downsampled({"j": "a"}, 0, 40_000, step_ms=5_000)
    plan = _plan(q)
    # BOTH tiers must prune on chunk_id: the raw-samples scan AND the
    # rollup-store scan (the rolled tier grows unboundedly with
    # retention age — an unpruned scan there reads every historical
    # rollup partition's footers per query).
    pruned_scans = [
        ln for ln in plan.splitlines()
        if "PartitionFilters: [isnotnull(chunk_id" in ln
        and "(chunk_id" in ln.split("isnotnull(chunk_id", 1)[1]
    ]
    assert len(pruned_scans) >= 2, plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert not _unbounded_single_partition_subtrees(plan)
    # and the result crosses the tier boundary
    got = {(r["bucket_ms"], r["n_points"]) for r in q.collect()}
    assert got == {(0, 1), (10_000, 1), (20_000, 1), (30_000, 1)}
    # a window past the rolled history must prune the rolled tier to
    # zero partitions (no false drop of in-range rolled data either:
    # the first window above already crossed both tiers)
    q2 = db.query_downsampled({"j": "a"}, 25_000, 40_000, step_ms=5_000)
    got2 = {(r["bucket_ms"], r["n_points"]) for r in q2.collect()}
    assert got2 == {(30_000, 1)}


def test_scan_multiplicity_guard_catches_duplicate_lineage(spark, sf_dir):
    """The scan-multiplicity guard must fire on the class it exists
    for: an N-way union of re-reads of the same source (the shape the
    per-table LSH blocking and uncheckpointed pagerank iterations
    produced) counts as N scans of one file."""
    from functools import reduce

    base = spark.read.parquet(f"{sf_dir}/region.parquet")
    df = reduce(lambda a, b: a.unionByName(b),
                [base.selectExpr("r_regionkey") for _ in range(_MAX_SAME_FILE_SCANS + 1)])
    assert _max_same_file_scans(_plan(df)) == _MAX_SAME_FILE_SCANS + 1
