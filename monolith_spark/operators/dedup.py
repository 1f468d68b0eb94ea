"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant):
- exact_dedup: one hash-groupBy — the 100 TB workhorse; content hash
  is computed map-side, the shuffle carries only (hash, id).
- shingle_jaccard_pairs: exact pairwise Jaccard via an inverted
  shingle index — the self-join is on the shingle key, so cost is
  sum over shingles of (docs-per-shingle)^2, not n^2 over documents.
  Right at small-to-medium corpora or as the verify stage after LSH.
- minhash_lsh_pairs: the 100 TB path — k md5-derived min-hashes,
  banded; candidate pairs only where a band signature collides, then
  exact-Jaccard verification of candidates. Shuffles are all on
  band/shingle keys; never all-pairs.
- simhash_pairs: Hamming-ball near-dup detection with prefix-bucket
  blocking.

All hashing is md5-based and seedless → deterministic across engines,
partitions, and runs; DuckDB oracles implement the identical
construction (see workload.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from monolith_spark.operators.text import fingerprint_md5, shingles_expr, simhash


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on normalized content hash.

    Returns [content_fp, n_docs, canonical_id] — canonical survivor is
    the min id; filter n_docs > 1 for duplicates only.
    """
    return (
        df.select(fingerprint_md5(text_col).alias("content_fp"), F.col(id_col))
        .groupBy("content_fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def passage_dup_stats(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level (sub-document) duplication: split each document
    into consecutive non-overlapping ``k``-token passages and count,
    per document, how many of its passages occur more than once in the
    whole corpus (CCNet/RefinedWeb-style paragraph dedup, at passage
    grain since the fixture has no paragraph breaks).

    Returns [id_col, n_passages, n_dup_passages, dup_fraction].

    Scale shape: passages are hashed to 8-byte xxhash64 keys map-side,
    so the corpus-frequency shuffle ships (hash, id) — never passage
    text; the duplicated-hash set joins back by semi-join on the same
    key. Collisions at 64-bit over ~1e12 passages are ~3e-8 per pair —
    acceptable for a *statistic*; exact_dedup-style md5 would be used
    for destructive removal.
    """
    raw = F.split(F.trim(F.col(text_col)), r"\s+")

    def _passages(w: Column) -> Column:
        # w is a bound lambda VARIABLE: the split runs once per row.
        # Referencing the raw split inside the per-passage lambda would
        # re-split per passage — O(tokens²/k) per doc (the winnowing
        # re-evaluation trap, SCALE traps memo).
        return F.transform(
            F.sequence(F.lit(1), F.floor(F.size(w) / k).cast("int")),
            lambda i: F.xxhash64(F.array_join(F.slice(w, (i - 1) * k + 1, k), " ")),
        )

    passages = F.element_at(F.transform(F.array(raw), _passages), 1)
    n_pass = F.floor(F.size(raw) / k).cast("long")
    base = df.select(
        F.col(id_col), n_pass.alias("n_passages"), passages.alias("__ph")
    ).filter(F.col("n_passages") >= 1)
    ex = base.select(id_col, F.explode("__ph").alias("h"))
    dup_h = ex.groupBy("h").count().filter(F.col("count") > 1).select("h")
    per_doc = (
        ex.join(dup_h, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_passages"))
    )
    return (
        base.drop("__ph")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_passages",
            F.coalesce("n_dup_passages", F.lit(0)).alias("n_dup_passages"),
            (
                F.coalesce("n_dup_passages", F.lit(0)).cast("double")
                / F.col("n_passages")
            ).alias("dup_fraction"),
        )
    )


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles, one row per (doc, shingle).

    Tokenizes into its own projection FIRST: shingles_expr references
    the token array once per shingle, and building it over the raw
    split expression re-evaluates the split per reference (the
    projection-collapse trap — 6× slower at sf0.1, A/B'd)."""
    from monolith_spark.operators.text import tokens_expr

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__w")
    )
    return toks.select(
        "doc_id", F.explode(shingles_expr(F.col("__w"), n, pre_tokenized=True)).alias("shingle")
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted shingle index.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|), doc_a < doc_b, >= threshold.

    Postings-list form: ONE shuffle of the exploded shingle table
    (groupBy shingle → sorted doc array), then ordered pairs explode
    from each posting — vs the naive self-join, which shuffles the
    shingle table TWICE on a wide string key and carries df=1
    shingles (the bulk of any real corpus) through the shuffle even
    though they can never produce a pair. Per-posting work is still
    Σ df², identical output: shingles are distinct per doc (so each
    posting holds a doc at most once) and array_sort gives the same
    doc_a < doc_b ordering the join predicate did.
    """
    from monolith_spark.operators.text import tokens_expr

    sh = doc_shingles(df, id_col, text_col, n)
    # |A| is computable map-side as the size of the distinct-shingle
    # array — no groupBy shuffle before the broadcast (same tokenize
    # path as doc_shingles so the count is the exploded row count).
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__w"))
    sizes = toks.select(
        "doc_id",
        F.size(shingles_expr(F.col("__w"), n, pre_tokenized=True)).cast("long").alias("n_shingles"),
    )
    post = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("__ds"))
        .filter(F.size("__ds") >= 2)
        .select(F.array_sort("__ds").alias("d"))
    )
    ex = post.select(F.col("d"), F.posexplode("d").alias("i", "doc_a"))
    inter = (
        ex.select(
            "doc_a",
            F.explode(F.slice("d", F.col("i") + 2, F.size("d"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return _attach_jaccard(inter, sizes, threshold)


def _attach_jaccard(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """Join per-doc shingle counts onto (doc_a, doc_b, n_inter) and
    compute/filter Jaccard.

    NO forced broadcast here: ``sizes`` is O(corpus docs) — at 1e9+
    docs a ``F.broadcast`` hint would force a multi-GB build side onto
    the driver and every executor (OOM). The joins are plain equi-joins
    and AQE converts them to broadcast-hash at runtime iff the measured
    side is under spark.sql.autoBroadcastJoinThreshold — a size gate on
    observed bytes rather than a hint on hoped-for bytes. (On small
    corpora Catalyst's plan-time scan stats reach the same decision.)
    """
    # Lazy checkpoint barrier: the jaccard>=τ filter below is
    # null-rejecting on n_shingles, and without the barrier Catalyst
    # pushes an isnotnull(n_shingles) predicate into BOTH join branches
    # — for the map-side caller that inlines the full tokenize+shingle
    # transform into the pushed Filter (the transform evaluated twice
    # and the split three times per scan, twice: stream + broadcast;
    # 0.7 s of a 3.3 s pass at sf0.1). Materializing the ~16-byte
    # (id, count) rows once removes all of it and single-evaluates the
    # sizes lineage across both join branches — O(docs) narrow rows.
    sizes = sizes.transform(_lineage_barrier, eager=False)
    na, nb = sizes.alias("na"), sizes.alias("nb")
    return (
        inter.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na.n_shingles") + F.col("nb.n_shingles") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# Universal-hash MinHash parameters: mh_i(x) = (a_i·h(x) + b_i) mod p
# over the Mersenne prime p = 2³¹−1, with h(x) the 60-bit md5 prefix
# reduced mod p. One expensive hash per shingle, k cheap linear
# transforms — vs. k full md5 passes (the 16×-explode variant this
# replaced cost ~6.6 s of a 12.8 s bench row at sf0.1). (a_i, b_i) are
# fixed literals from a seeded PRNG, mirrored verbatim in the oracle.
MINHASH_PRIME = (1 << 31) - 1
import random as _random

from monolith_spark.barrier import barrier as _lineage_barrier

_mh_rng = _random.Random(0x5EED)
MINHASH_AB: list[tuple[int, int]] = [
    (_mh_rng.randrange(1, MINHASH_PRIME), _mh_rng.randrange(0, MINHASH_PRIME))
    for _ in range(64)
]
del _mh_rng


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """k MinHash values per doc via universal hashing: min over
    shingles of (a_i·h + b_i) mod p, h = 60-bit md5 prefix mod p.

    One shuffle (groupBy doc) with k min aggregates over map-side
    linear transforms of a single per-shingle hash; a_i·(h mod p) <
    2⁶² so the arithmetic never overflows BIGINT on either engine.
    ``shingles`` lets a caller that already materialized the
    (doc_id, shingle) rows (minhash_lsh_pairs shares them with its
    verification stage) pass them in instead of re-running the
    tokenize+explode pass.
    """
    from monolith_spark.operators.text import hash60_expr

    sh = shingles if shingles is not None else doc_shingles(df, id_col, text_col, n)
    h = (hash60_expr(F.col("shingle")) % MINHASH_PRIME).alias("h")
    hashed = sh.select("doc_id", h)
    aggs = [
        F.min(
            (F.col("h") * F.lit(a) + F.lit(b)) % MINHASH_PRIME
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_band_signatures(
    sigs: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Collapse k minhashes into `bands` band signatures (md5 of the
    ':'-joined rows in each band — the separator keeps the key
    injective over integer minhash values): [doc_id, band, band_sig]."""
    rows = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ":", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                )
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Candidates = pairs agreeing on >= 1 band signature; each candidate
    is then verified with exact shingle Jaccard and filtered at
    `threshold`. Output matches shingle_jaccard_pairs wherever LSH
    recall is 1; the banding (4 bands x 4 rows) puts the S-curve
    midpoint at t ~ (1/4)^(1/4) ~ 0.71 — candidates get generous
    recall at 0.5 on small corpora while pruning the quadratic space.
    """
    # ONE shingle materialization for the whole operator: the same
    # (doc_id, shingle) rows feed the minhash aggregation AND both
    # sides of the verification intersection + the sizes aggregate —
    # without sharing, the tokenize+explode pass ran once for the
    # signatures and again for verification.
    sh = doc_shingles(df, id_col, text_col, n).transform(_lineage_barrier, eager=False)
    bsigs = minhash_band_signatures(
        minhash_signatures(df, id_col, text_col, n, num_hashes, shingles=sh),
        num_hashes,
        bands,
    )
    x, y = bsigs.alias("x"), bsigs.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact verification of candidates only, off the shared shingle
    # materialization above.
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        candidates.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return _attach_jaccard(inter, sizes, threshold)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    prefix_bits: int = 12,
    bits: int = 60,
    max_block_size: int = 1024,
) -> DataFrame:
    """SimHash near-dup pairs: block on each of several bit-prefixes
    (rotations) then verify Hamming distance <= max_hamming.

    Blocking on rotated prefixes keeps recall while avoiding the full
    cross join; with 4 rotations of 12 bits, any pair differing in
    <= 3 of the 4 non-overlapping 15-bit regions collides somewhere.
    Not exhaustive (standard LSH trade-off) — the guarantee is
    per-rotation-block exactness up to the block-size cap.

    Postings-list form (same shape as shingle_jaccard_pairs): ONE
    shuffle groups members by (rot, block); ordered pairs then explode
    from each sorted posting — no self-join, so no second shuffle of
    the blocked table and no skew-prone join build sides.

    ``max_block_size`` bounds per-block fan-out: a hot prefix (near-
    identical boilerplate flooding one 12-bit block) would otherwise
    cost |block|² in one task — the classic LSH straggler. Each
    posting is truncated to its first ``max_block_size`` members (by
    doc_id — deterministic, engine-independent), capping any single
    block at max_block_size² pair checks. Docs beyond the cap in SOME
    rotation usually still pair via their other 3 rotations; a block
    that hot is near-identical boilerplate better handled by
    exact_dedup first.

    Features are word 3-gram shingles, not tokens: on small-vocabulary
    corpora token sets are nearly identical across unrelated docs and
    token-simhash collapses (observed: 11k pairs from 5k fixture docs).
    """
    sh = simhash(df, id_col, text_col, bits, feature_expr=shingles_expr(text_col, 3))
    rotations = 4
    step = bits // rotations
    # rot as EXPLODED data with a rot-dependent shift, not a 4-way
    # union of per-rotation selects: union branches each re-evaluate
    # their child, so the whole simhash lineage (tokenize + shingle +
    # 60-bit hashing) ran once per rotation. Same (doc_id, simhash,
    # rot, block) rows — the shift formula is the per-branch constant
    # max(bits - prefix_bits - rot*step, 0) evaluated in-engine.
    # Generate barrier first (the explode(array(x)) device): simhash is
    # an expensive fold and projection collapse would otherwise inline
    # it into every post-explode reference — the barrier pins it as a
    # real attribute computed ONCE per doc before the 4-way fan-out.
    pinned = sh.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array("simhash")).alias("simhash"),
    )
    blocked = pinned.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(r) for r in range(rotations)])).alias("rot"),
    ).withColumn(
        "block",
        F.expr(
            f"shiftright(simhash, greatest({bits - prefix_bits} - rot * {step}, 0))"
            f" & {(1 << prefix_bits) - 1}"
        ),
    )
    # Sorted posting per (rot, block); doc_id is unique within a block
    # (one row per doc per rotation) so array_sort orders by doc_id and
    # the slice keeps the cap deterministic.
    post = (
        blocked.groupBy("rot", "block")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("d"))
        .filter(F.size("d") >= 2)
        .select(F.slice("d", 1, max_block_size).alias("d"))
    )
    ex = post.select("d", F.posexplode("d").alias("i", "a"))
    return (
        ex.select(
            "a",
            F.explode(F.slice("d", F.col("i") + 2, F.size("d"))).alias("b"),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def cluster_pairs(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b",
                  max_iter: int = 50) -> DataFrame:
    """Connected components over a near-dup pair graph: assign every
    node the minimum id reachable from it, i.e. [node, cluster_id].
    The canonicalization step after any pairwise dedup — "keep one doc
    per duplicate group" needs groups, not pairs.

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels — one hop per
    round, so convergence takes O(component diameter) rounds (near-dup
    components are tiny and shallow; ``max_iter`` bounds pathological
    chains and exhaustion RAISES rather than returning silently-split
    clusters). Each round is one equi-join + one groupBy on node id —
    shuffle volume stays O(edges); no all-pairs, no driver-side graph.
    Every round is localCheckpoint-ed: iterative lineage must be
    truncated or each subsequent job replays all previous rounds (and
    the final plan nests max_iter joins deep). The convergence check
    is a LIMIT-1 existence probe of changed labels, not a collect.
    Distributed CC in O(log n) rounds (large-star/small-star) only
    pays off at far larger component diameters.
    """
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    ).transform(_lineage_barrier, eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    ).transform(_lineage_barrier, eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("__changed"),
            )
        ).transform(_lineage_barrier, eager=True)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"cluster_pairs did not converge in {max_iter} rounds — a component "
        f"has diameter > {max_iter}; raise max_iter"
    )


def keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the deduplicated corpus: from a (node, cluster_id)
    assignment (cluster_pairs output) keep ONE canonical doc per
    near-dup cluster — highest ``score_col``, ties to the lowest id —
    and every un-clustered doc as its own singleton cluster.

    The "keep one per group" selection every dedup pipeline ends with
    (the reference stops at pair/cluster *detection*; this is the
    materialization step a training-data pipeline actually ships).

    Scale shape: ``clusters`` holds near-dup nodes only, so the winner
    ranking windows over a relation no bigger than the corpus, and the
    singleton path is an ANTI join against that same node set. The
    node set is NOT hint-broadcast: "near-dup nodes ≪ corpus" fails on
    web-scale crawls where dup rates run 30-50%, and a forced
    broadcast of an O(corpus) relation OOMs the driver. AQE converts
    the anti join to broadcast at runtime iff the measured node set is
    under autoBroadcastJoinThreshold — the gate is observed bytes.
    ``docs`` must carry (id_col, score_col) and is scanned once.
    """
    scored = docs.select(F.col(id_col).alias("doc_id"), F.col(score_col))
    ranked = (
        clusters.join(scored, F.col("node") == F.col("doc_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col(score_col).desc(), F.col("node")
                )
            ),
        )
    )
    winners = ranked.filter(F.col("__rn") == 1).select(
        "doc_id", "cluster_id", score_col
    )
    singletons = scored.join(
        clusters.select(F.col("node").alias("doc_id")),
        "doc_id",
        "left_anti",
    ).select("doc_id", F.col("doc_id").alias("cluster_id"), score_col)
    return winners.unionByName(singletons)


def pagerank(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair graph (e.g. near-dup pairs):
    [node, rank] after ``iters`` power iterations — a centrality
    signal for canonical-document selection (the most-linked doc in a
    duplication neighborhood is usually the original; feed `rank` to
    keep_best as score_col).

    Fixed-iteration DataFrame power method: per round one equi-join
    edges⋈ranks + one groupBy(dst) — shuffle volume O(edges), no
    driver state (the same shape as cluster_pairs, but with fixed
    rounds so an unrolled SQL oracle can replay it exactly).

    Cross-engine exactness devices (the kmeans_lloyd recipe): per-edge
    contributions rank/deg narrow to DECIMAL(38,18) before the
    order-free Σ; the damping update is a fixed expression of that
    exact sum; final ranks surface as doubles (callers wanting
    hash-exact output should round via DECIMAL(18,9), see
    docs_pagerank).
    """
    # pairs usually comes from an expensive pair-generation join, and
    # deg/nodes/count plus EVERY power iteration reference edges —
    # checkpoint it once, and cut the ranks lineage per round, or each
    # job replays the whole chain (the sf0.01 docs_pagerank plan
    # re-scanned the corpus 42× before this; cluster_pairs already
    # applies the same device).
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .transform(_lineage_barrier, eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.count()  # one job; the scalar parameterizes the plan
    ranks = nodes.select(
        "node", "deg", (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank")
    )
    base = (1.0 - damping) / float(n_nodes)
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(F.col("node").alias("src"), "deg", "rank"), "src"
            )
            .select(
                "dst",
                (F.col("rank") / F.col("deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            "deg",
            (
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        ).transform(_lineage_barrier, eager=False)
    return ranks.select("node", "rank")


def span_dup_stats(
    df: DataFrame,
    window: int = 20,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_tokenized: bool = False,
) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the scalable
    approximation of exact-substring training-data dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): hash every ``window``-token span, call a span
    duplicated when its hash occurs in >= 2 distinct documents, and
    report the per-document duplicated fraction. At the default
    stride=1 every offset is hashed, so ANY shared run of >= window
    tokens is detected regardless of where it sits in each doc — the
    paper's guarantee at fixed length, one explode + one hash groupBy
    (shuffle-linear; a distributed suffix array is a multi-round
    sort). stride>1 cuts the explode by that factor but detects only
    POSITION-ALIGNED duplication (a single prepended token shifts
    every phase and hides the copy) — use it for exact-copy/prefix
    scans only; content-defined selection for unaligned matches at
    sub-linear density is winnowing's job (winnow_fingerprints_expr).

    Returns [doc_id, n_spans, n_dup_spans, dup_frac] for EVERY input
    doc; docs shorter than ``window`` tokens have zero spans and a
    NULL fraction. The dup-hash side of the final join is NOT
    hint-broadcast — boilerplate-heavy web crawls make it O(corpus),
    AQE decides from measured bytes.
    """
    from monolith_spark.operators.text import tokens_expr

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(text_col) if pre_tokenized else tokens_expr(text_col)).alias("__w"),
    )
    spans = (
        toks.filter(F.size("__w") >= window)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (window - 1), F.lit(stride))
            ).alias("__i"),
            "__w",
        )
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice("__w", F.col("__i"), window), " ")).alias("__h"),
        )
    )
    # Pre-aggregate to the (hash, doc) grain FIRST: both downstream
    # branches (the >=2-distinct-docs hash set and the per-doc span
    # stats) then read the SAME exchange, so ReuseExchange computes the
    # tokenize+explode+md5 pass once instead of once per branch
    # (before: two full span scans — guide §2.4, remove shuffles/passes
    # by sharing one identical exchange subtree).
    # The explicit isnotnull(__h) keeps BOTH branches' copies of this
    # subtree canonically identical: the dup_h side of the left join
    # gets isnotnull(__h) pushed into its lineage by the optimizer, and
    # without the same filter on the per-doc side the two exchange
    # subtrees differ and the reuse never fires (md5 is never null, so
    # the filter is a no-op semantically).
    # isnotnull(__h) / isnotnull(doc_id) are semantic no-ops (md5 never
    # returns null, null ids never join) added so the optimizer pushes
    # the SAME filters into both branches' copies of this subtree —
    # the left joins below push them into one branch only, and any
    # asymmetry defeats the exchange reuse.
    per_dh = (
        spans.filter(F.col("__h").isNotNull() & F.col("doc_id").isNotNull())
        .groupBy("__h", "doc_id")
        .agg(F.count("*").alias("__c"))
    )
    # sum(least(__c, 1)) == count of per-(hash, doc) rows == distinct
    # docs per hash, since __c >= 1 by construction. Written this way
    # (not count(*)) so the aggregate genuinely CONSUMES __c: a plain
    # count lets the optimizer prune __c's computation from this
    # branch's copy of the per_dh subtree, the two exchange subtrees
    # then differ, and the reuse never fires.
    dup_h = (
        per_dh.groupBy("__h")
        .agg(F.sum(F.least(F.col("__c"), F.lit(1))).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h", F.lit(1).alias("__dup"))
    )
    agg = (
        per_dh.join(dup_h, "__h", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("n_spans"),
            F.sum(F.col("__c") * F.coalesce(F.col("__dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                F.col("n_dup_spans").cast("double") / F.col("n_spans"),
            ).alias("dup_frac"),
        )
    )


def shingle_tf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    df_cap: int = 50,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_tokenized: bool = False,
) -> DataFrame:
    """Sparse TF-cosine near-dup pairs over word n-gram shingles:
    [doc_a, doc_b, tf_cosine] with doc_a < doc_b and cosine >=
    threshold, where each doc is the (implicit) shingle-count vector
    and terms with document frequency > ``df_cap`` are dropped from
    the feature space.

    The frequency-weighted complement to shingle_jaccard_pairs (sets
    ignore repetition; TF-cosine catches boilerplate-heavy near-dups
    where one doc repeats the shared content). Same one-shuffle
    postings shape as the Jaccard path — postings explode ordered
    pairs, never a corpus self-join — plus the df cap the Jaccard path
    lacks: per-posting pair work is Σ_{df<=cap} df² <= cap·Σdf, i.e.
    LINEAR in corpus shingles with a constant cap, so one boilerplate
    shingle can't produce a quadratic straggler. df=1 terms are
    skipped in postings (they pair with nothing) but kept in norms;
    dropping df>cap terms from BOTH dot and norms keeps it an exact
    cosine over the capped vocabulary.

    Exact cross-engine: dot and squared norms are BIGINT sums of
    BIGINT products (order-free), then ONE sqrt·sqrt multiply and ONE
    divide in double — bit-identical on any engine, no fold-order
    caveat.
    """
    from monolith_spark.operators.text import shingles_expr, tokens_expr

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(text_col) if pre_tokenized else tokens_expr(text_col)).alias("__w"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            shingles_expr(F.col("__w"), n, distinct=False, pre_tokenized=True)
        ).alias("term"),
    )
    tf = sh.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # ONE postings aggregation carries both the document frequency
    # (size of the postings list) and the per-doc tfs; the norm branch
    # (df <= cap, including df=1 terms) and the pair branch
    # (2 <= df <= cap) filter ABOVE this shared aggregate, so both hang
    # off the identical exchange and ReuseExchange runs the tokenize +
    # shingle explode + both shuffles once. The previous shape joined
    # tf against a separately-aggregated dfq per branch: five distinct
    # replays of the explode lineage in the physical plan, zero reuse
    # (guide §2.4).
    post_all = tf.groupBy("term").agg(
        F.collect_list(F.struct("doc_id", "tf")).alias("__ds")
    )
    n2 = (
        post_all.filter(F.size("__ds") <= df_cap)
        .select(F.explode("__ds").alias("e"))
        .groupBy(F.col("e.doc_id").alias("doc_id"))
        .agg(F.sum(F.col("e.tf") * F.col("e.tf")).cast("long").alias("n2"))
    )
    post = post_all.filter(
        (F.size("__ds") >= 2) & (F.size("__ds") <= df_cap)
    ).select(F.array_sort("__ds").alias("d"))
    ex = post.select("d", F.posexplode("d").alias("i", "a"))
    dot = (
        ex.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.tf").alias("__tfa"),
            F.explode(F.slice("d", F.col("i") + 2, F.size("d"))).alias("b"),
        )
        .groupBy("doc_a", F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("__tfa") * F.col("b.tf")).cast("long").alias("dot"))
    )
    x = n2.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("__na"))
    y = n2.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("__nb"))
    return (
        dot.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn(
            "tf_cosine",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double"))),
        )
        .filter(F.col("tf_cosine") >= threshold)
        .select("doc_a", "doc_b", "tf_cosine")
    )


def shingle_containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ASYMMETRIC containment near-dup pairs: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)| — the excerpt/quote
    detector. Jaccard divides by the UNION, so a 50-token doc fully
    contained in a 5000-token doc scores ~0.01 and is invisible;
    containment scores it 1.0. Broder's resemblance-vs-containment
    distinction (1997, "On the resemblance and containment of
    documents").

    Returns [inner_id, outer_id, containment] with containment(inner
    in outer) >= threshold and inner_id != outer_id — each UNORDERED
    candidate pair is scored in both directions and emitted once per
    direction that clears the threshold (a pair of near-equal docs
    yields two rows; an excerpt yields one).

    Same one-shuffle postings shape as shingle_jaccard_pairs (df=1
    shingles dropped before pair-gen, per-doc sizes joined unhinted —
    AQE decides the build side); the only delta is the denominator.
    """
    from monolith_spark.operators.text import tokens_expr

    sh = doc_shingles(df, id_col, text_col, n)
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__w"))
    # Lazy checkpoint barrier — same rationale as shingle_jaccard_pairs:
    # keeps the containment>=τ null-rejection from inlining the shingle
    # transform into pushed-down Filters, and single-evaluates the
    # tokenize pass across the four join-branch references below.
    sizes = toks.select(
        "doc_id",
        F.size(shingles_expr(F.col("__w"), n, pre_tokenized=True)).cast("long").alias("n_shingles"),
    ).transform(_lineage_barrier, eager=False)
    post = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("__ds"))
        .filter(F.size("__ds") >= 2)
        .select(F.array_sort("__ds").alias("d"))
    )
    ex = post.select(F.col("d"), F.posexplode("d").alias("i", "doc_a"))
    inter = (
        ex.select(
            "doc_a",
            F.explode(F.slice("d", F.col("i") + 2, F.size("d"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("__na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("__nb"))
    scored = inter.join(na, "doc_a").join(nb, "doc_b")
    fwd = scored.select(
        F.col("doc_a").alias("inner_id"),
        F.col("doc_b").alias("outer_id"),
        (F.col("n_inter").cast("double") / F.col("__na")).alias("containment"),
    )
    rev = scored.select(
        F.col("doc_b").alias("inner_id"),
        F.col("doc_a").alias("outer_id"),
        (F.col("n_inter").cast("double") / F.col("__nb")).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)
