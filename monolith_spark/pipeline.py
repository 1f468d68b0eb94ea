"""The corpus-curation last mile: verdicts → materialized dataset.

`curation_verdicts` is the composed audit-trail pipeline (adaptive
per-source quality gate → exact dedup → df-capped TF-cosine near-dup
drop → duplicated-span gate, each stage running only on the previous
stage's survivors — the Lee et al. ordering). `curate_and_export`
materializes what a training run actually consumes: the surviving
corpus, the per-document audit trail, and a manifest with per-stage
counts — the provenance record a 100 TB data pipeline ships next to
every dataset snapshot.

Scale shape: the verdict plan composes only already-verified operators
(see their SCALE.md rows); the export adds two partitioned parquet
writes and ONE driver-side collect of the per-verdict counts (5 rows).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monolith_spark.operators import dedup as _dedup
from monolith_spark.operators import text as _text

from monolith_spark.barrier import barrier as _lineage_barrier


def curation_verdicts(
    docs: DataFrame,
    band_pct: tuple[int, int] = (5, 95),
    min_stopword_ratio: float = 0.04,
    tf_cosine_tau: float = 0.3,
    span_frac_max: float = 0.9,
) -> DataFrame:
    """Per-document audit trail of the composed curation pipeline:
    [doc_id, verdict in ('gated','exact_dup','near_dup','span_heavy',
    'kept')] — each doc gets the verdict of the FIRST stage that
    rejected it, and each stage runs only on the previous stage's
    survivors (true pipeline semantics, not independent filters).

    Stages: adaptive per-source token-length band (``band_pct``
    percentiles of the (source, length) histogram) + stopword-density
    gate → exact dedup (keep min id per content hash) → df-capped
    TF-cosine near-dup drop (greedy lowest-id keep) → duplicated-span
    gate over the DEDUPED survivors (> ``span_frac_max`` duplicated
    spans = template boilerplate; running span stats after dedup is
    the Lee et al. order — before dedup the signal is dominated by the
    near-dup echo this pipeline just removed).
    """
    lo_pct, hi_pct = band_pct
    # ONE tokenize pass over the corpus, reduced to a narrow per-doc
    # feature row (ids, content hash, two numbers — never text) and
    # materialized: the length-band histogram, the gate, the exact-dedup
    # window and the final verdict joins all branch off this table, so
    # the expensive scan+tokenize subtree is not re-evaluated per branch
    # (pre-restructure the plan scanned documents 10x / tokenized 6x).
    t = docs.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim(F.col("text")))).alias("__ch"),
        _text.tokens_expr("text").alias("__w"),
    ).select(
        "doc_id",
        "source",
        "__ch",
        F.size("__w").cast("long").alias("n_tokens"),
        (
            F.size(F.filter(F.col("__w"), lambda x: x.isin(_text.STOPWORDS))).cast(
                "double"
            )
            / F.size("__w")
        ).alias("stop_ratio"),
    ).transform(_lineage_barrier, eager=True)
    h = t.groupBy("source", F.col("n_tokens").alias("v")).agg(F.count("*").alias("c"))
    ch = h.select(
        "source",
        "v",
        F.sum("c").over(Window.partitionBy("source").orderBy("v")).alias("cum"),
        F.sum("c").over(Window.partitionBy("source")).alias("cnt"),
    )
    lo_rank = F.greatest(F.expr(f"(cnt*{lo_pct}+99) div 100"), F.lit(1))
    hi_rank = F.expr(f"(cnt*{hi_pct}+99) div 100")
    band = ch.groupBy("source").agg(
        F.min(F.when(F.col("cum") >= lo_rank, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("v"))).alias("hi"),
    )
    g = t.join(band, "source").select(
        "doc_id",
        "__ch",
        (
            F.col("n_tokens").between(F.col("lo"), F.col("hi"))
            & (F.col("stop_ratio") >= min_stopword_ratio)
        ).alias("gate_ok"),
    )
    e = g.filter("gate_ok").select(
        "doc_id",
        (
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("__ch"))
        ).alias("exact_ok"),
    )
    # survivors feed TWO tokenizing stages (tf-cosine and span stats)
    # plus the final verdict joins — re-attach the TOKENS to the
    # surviving ids and materialize once, so the survivor corpus is
    # tokenized exactly once for both downstream stages (they consume
    # the array via pre_tokenized=True) instead of re-splitting text
    # per consumer
    ek = (
        docs.select("doc_id", _text.tokens_expr("text").alias("__w"))
        .join(e.filter("exact_ok").select("doc_id"), "doc_id")
        .transform(_lineage_barrier, eager=True)
    )
    # lazy barrier: nd feeds BOTH the survivor anti-join (inside the
    # span-stats lineage) and the final verdict join — without it the
    # whole tf-cosine pairs pass runs twice in the final plan (the two
    # consumers join on different shapes, so ReuseExchange can't help)
    nd = (
        _dedup.shingle_tf_cosine_pairs(
            ek, threshold=tf_cosine_tau, text_col="__w", pre_tokenized=True
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__nd", F.lit(True))
        .transform(_lineage_barrier, eager=False)
    )
    nk = ek.join(nd.select("doc_id"), "doc_id", "left_anti")
    sv = nk.join(
        _dedup.span_dup_stats(nk, text_col="__w", pre_tokenized=True).select(
            "doc_id", F.coalesce("dup_frac", F.lit(0.0)).alias("__df")
        ),
        "doc_id",
    ).select("doc_id", (F.col("__df") <= span_frac_max).alias("span_ok"))
    # the stages partition the corpus into DISJOINT verdict sets by
    # construction (each stage consumes exactly the previous stage's
    # survivors: g covers every doc, e covers the gate survivors, nd ⊆
    # exact survivors, sv covers every non-near-dup survivor — span
    # stats emit a row for EVERY input doc), so the audit trail is a
    # narrow 4-way UNION of per-stage rejections + the kept set instead
    # of four doc-grain left joins (r9 verdict next-round #3: each join
    # was one more doc-grain shuffle at 100 TB; the union adds none)
    gated = g.filter(~F.coalesce(F.col("gate_ok"), F.lit(False))).select(
        "doc_id", F.lit("gated").alias("verdict")
    )
    exact = e.filter(~F.col("exact_ok")).select(
        "doc_id", F.lit("exact_dup").alias("verdict")
    )
    near = nd.select("doc_id", F.lit("near_dup").alias("verdict"))
    spanv = sv.select(
        "doc_id",
        F.when(F.col("span_ok"), F.lit("kept"))
        .otherwise(F.lit("span_heavy"))
        .alias("verdict"),
    )
    return gated.unionByName(exact).unionByName(near).unionByName(spanv)


def prune_and_export(
    embs: DataFrame,
    out_dir: str,
    tau: float = 0.4,
    k: int = 8,
    iters: int = 2,
    prune_pct: int = 20,
) -> dict:
    """The embedding-side snapshot: run D4 (SemDeDup + prototypicality
    pruning — similarity.py:d4_prune), materialize the surviving
    vectors and the per-vector verdict trail, and write the manifest.

    Layout mirrors curate_and_export: ``verdicts/`` (vec_id,
    cluster_id, verdict, proto_cosine), ``corpus/`` (surviving input
    rows, all columns), ``manifest.json``. The manifest is written
    LAST — it is the snapshot's commit marker; a crashed export leaves
    parquet dirs but no manifest, so consumers keyed on the manifest
    never read a partial snapshot.
    """
    from monolith_spark.operators.similarity import d4_prune

    verdicts = d4_prune(
        embs, tau=tau, k=k, iters=iters, prune_pct=prune_pct
    ).transform(_lineage_barrier, eager=True)
    verdicts.write.mode("overwrite").parquet(os.path.join(out_dir, "verdicts"))
    corpus = embs.join(
        verdicts.filter(F.col("verdict") == "kept").select("vec_id"),
        "vec_id",
        "left_semi",
    )
    corpus.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus"))
    by_verdict = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "input_vectors": sum(by_verdict.values()),
        "kept_vectors": by_verdict.get("kept", 0),
        "verdicts": dict(sorted(by_verdict.items())),
        "d4": {"tau": tau, "k": k, "iters": iters, "prune_pct": prune_pct},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def curate_and_export(docs: DataFrame, out_dir: str, **curation_kwargs: Any) -> dict:
    """Run the audit-trail curation and materialize the dataset
    snapshot a training run consumes:

    - ``<out_dir>/verdicts/`` — the full per-document audit trail
    - ``<out_dir>/corpus/``   — the surviving documents (all input
      columns), the thing downstream tokenization reads
    - ``<out_dir>/manifest.json`` — input/kept counts and the
      per-verdict breakdown (the provenance record of the snapshot)

    Returns the manifest dict. The verdict frame is checkpointed once
    and feeds the write, the count collect (5 rows), and the survivor
    semi-join without re-running the pipeline per consumer. The
    manifest is written LAST — it is the snapshot's commit marker; a
    crashed export leaves parquet dirs but no manifest, so consumers
    keyed on the manifest never read a partial snapshot.
    """
    verdicts = curation_verdicts(docs, **curation_kwargs).transform(_lineage_barrier, eager=True)
    verdicts.write.mode("overwrite").parquet(os.path.join(out_dir, "verdicts"))
    corpus = docs.join(
        verdicts.filter(F.col("verdict") == "kept").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    corpus.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus"))
    by_verdict = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "input_docs": sum(by_verdict.values()),
        "kept_docs": by_verdict.get("kept", 0),
        "verdicts": dict(sorted(by_verdict.items())),
        "curation": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in curation_kwargs.items()
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def export_curriculum(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str | None = None,
    descending: bool = False,
) -> dict:
    """Materialize the corpus in CURRICULUM ORDER: every document gets
    a global schedule ordinal (default key: token count ascending —
    the short-to-long length curriculum; pass ``key_col`` for an
    LM-score or custom difficulty column), and the export is written
    so a trainer consuming shards in filename order, rows in row
    order, reads the exact global schedule.

    The ordinal comes from the exact histogram-offset rank device
    (operators/ranking.py) and the layout from
    ``repartitionByRange(n_shards, ordinal)`` +
    ``sortWithinPartitions(ordinal)`` — a total order over the corpus
    in which EVERY operator is shuffle-parallel: the range exchange
    samples boundaries instead of funneling rows through one sort
    task, so the same plan stands at 100 TB where a global
    ``orderBy`` write would not. Manifest written LAST
    (commit-marker idiom, as curate_and_export).
    """
    from monolith_spark.operators.ranking import with_exact_rank

    if key_col is None:
        key_col = "__n_tokens"
        docs = docs.withColumn(key_col, _text.token_count("text").cast("long"))
    ranked, n, _ = with_exact_rank(
        docs, key_col, ["doc_id"], "ordinal", descending=descending
    )
    out = ranked.withColumn(
        "sched_pct", F.col("ordinal").cast("double") / F.lit(float(n))
    )
    if key_col == "__n_tokens":
        out = out.drop(key_col)
    (
        out.repartitionByRange(n_shards, "ordinal")
        .sortWithinPartitions("ordinal")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "corpus"))
    )
    manifest = {
        "input_docs": n,
        "n_shards": n_shards,
        "order": f"{key_col} {'desc' if descending else 'asc'}, doc_id",
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def snapshot_diff(
    spark,
    old_dir: str,
    new_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version audit between two corpus snapshots (parquet
    dirs of documents): one row per doc_id present in either, with
    ``status`` in added / removed / changed / unchanged by content
    fingerprint — the provenance diff a 100 TB pipeline publishes
    alongside each new snapshot so consumers know what moved.

    Scale shape: each snapshot is scanned ONCE and immediately
    reduced to (id, md5) — the full-outer equi-join shuffles
    fingerprints, never text; at equal sizes this is the minimal
    2-scan diff (content-defined chunking would only help below the
    file level, which parquet already dedups by row group).
    """
    old = spark.read.parquet(old_dir).select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__old_fp")
    )
    new = spark.read.parquet(new_dir).select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__new_fp")
    )
    return old.join(new, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def shard_assignment(
    docs: DataFrame,
    shard_bytes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic, byte-balanced training-shard assignment: the
    "global shuffle + fixed-size shards" step every tokenizer-feed
    pipeline runs before training. Documents are laid on one
    pseudo-random global line (ordered by a 60-bit md5 of the id —
    reshuffling identically on every run and every engine) and cut
    into shards of ``shard_bytes`` by START OFFSET: a doc belongs to
    shard ``floor(offset / shard_bytes)``, so every shard's payload is
    < shard_bytes + max_doc_bytes and shard count ≈ total/shard_bytes.

    Scale shape — a distributed PREFIX SUM, never a single-partition
    window: docs hash into ``n_buckets`` ordered buckets; each bucket
    computes its local running sum key-parallel (window partitioned by
    bucket), bucket byte-totals (≤ n_buckets rows) turn into bucket
    start offsets, and global offset = bucket offset + local prefix.
    The result equals ONE window over the total order (bucket, h, id)
    — which is exactly how the DuckDB oracle replays it — but the plan
    has no unbounded SinglePartition exchange at any size.

    Returns [id, n_bytes, offset_bytes, shard_id].
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    d = docs.select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        h.alias("__h"),
    ).withColumn("__b", F.pmod(F.col("__h"), F.lit(n_buckets)))
    local = d.withColumn(
        "__local",
        F.sum("n_bytes").over(
            Window.partitionBy("__b")
            .orderBy("__h", id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = (
        d.groupBy("__b").agg(F.sum("n_bytes").alias("__t")).orderBy("__b").collect()
    )  # ≤ n_buckets rows — bounded driver state, not data-dependent
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__b"]] = acc
        acc += r["__t"]
    # bucket offsets inline as ONE literal map (<= n_buckets entries) —
    # no createDataFrame, no broadcast-join stage; every __b is a key by
    # construction so ANSI element_at never misses
    off_col = (
        F.element_at(
            F.expr(
                "map(" + ",".join(f"{b},{o}L" for b, o in offsets.items()) + ")"
            ),
            F.col("__b"),
        )
        if offsets
        else F.lit(0).cast("long")  # empty input: zero rows either way
    )
    return (
        local.withColumn(
            "offset_bytes",
            off_col + F.col("__local") - F.col("n_bytes"),
        )
        .withColumn(
            "shard_id", (F.col("offset_bytes") / F.lit(shard_bytes)).cast("long")
        )
        .select(id_col, "n_bytes", "offset_bytes", "shard_id")
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    shard_bytes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Materialize the shard layout: one parquet partition per shard
    (shard_id=N dirs), docs stored in their global-line order, plus a
    manifest.json with shard count and byte totals. The write
    repartitions BY shard (each output task owns whole shards — no
    small-file spray) and sorts within partitions by offset so readers
    stream docs in the deterministic training order."""
    assigned = shard_assignment(
        docs, shard_bytes, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    out = (
        docs.join(assigned, id_col)
        .repartition("shard_id")
        .sortWithinPartitions("offset_bytes")
    )
    out.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    stats = (
        assigned.groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_bytes").alias("bytes"))
        .orderBy("shard_id")
        .collect()
    )
    manifest = {
        "shard_bytes": shard_bytes,
        "n_shards": len(stats),
        "shards": [
            {"shard_id": r["shard_id"], "n_docs": r["n_docs"], "bytes": r["bytes"]}
            for r in stats
        ],
    }
    # underscore prefix: parquet readers skip it as metadata, so the
    # dataset root stays directly spark.read.parquet()-able
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
