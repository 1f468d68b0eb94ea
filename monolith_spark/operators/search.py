"""Full-text keyword search: inverted postings + BM25-family scoring.

A training-data pipeline needs corpus search (dataset debugging,
targeted filtering, decontamination triage), and the reference's
inverted label index (/root/reference/src/indexer/sled_indexer.rs:23-25,
posting lists per `k=v`) is the same structure one power-of-two up:
postings per *term* instead of per label pair. Spark-first shape:

- postings: project (doc, tokens, dl=size(tokens)), explode, groupBy
  (doc, term) — ONE shuffle, linear in corpus tokens, dl rides along
  so no second join against a doc-length table.
- query-driven pruning: the (tiny, literal) query-term table is
  broadcast-semi-joined BEFORE the shuffle, so only matching tokens
  ever leave the scan — at 100 TB the shuffle carries |hits|, not
  |corpus tokens|.
- document frequency for the scored terms falls out of the pruned
  postings (count of docs per term); corpus-wide N and avgdl are one
  scan-level aggregate (no explode, no shuffle).
- scoring: BM25 with the Robertson–Sparck-Jones idf in ODDS form
  (no logarithm). Cross-engine float parity demands it: ln() is not
  IEEE-exact-rounded and differs between libm and the JVM, while
  +,-,*,/ are exact-rounded and bit-identical everywhere. Per-term
  scores are therefore bit-equal on any engine; they are narrowed to
  DECIMAL(18,9) before the per-document sum so the reduction is exact
  regardless of addition order (the same trick the money aggregates
  use). Constants appear as the same decimal literals on both sides.

Tokenization is lowercase whitespace splitting — chosen because Spark
`split` and DuckDB `string_split_regex` interpret `\\s+` identically,
keeping the oracle honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_DEC = "decimal(18,9)"


def tokenize(text):
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )


def postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: list[str] | None = None,
) -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct term per doc.

    With `terms`, non-matching tokens are dropped BEFORE the explode
    (array-level filter), so the Generate emits |hit tokens| rows, not
    |corpus tokens| — at 100 TB the per-row explode fan-out, not just
    the shuffle, is bounded by the hit count."""
    # Tokenize into its own projection FIRST (the doc_shingles device):
    # referencing tokenize() twice in one select — size() for dl and the
    # filtered explode — re-evaluates the split per reference.
    base = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__t"))
    toks = F.col("__t")
    if terms is not None:
        toks = F.filter(toks, lambda t: t.isin(*terms))
    flat = base.select(
        "doc_id",
        F.size("__t").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return flat.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row (n, avgdl) — aggregate projection, no explode/shuffle."""
    return docs.agg(
        F.count("*").alias("n"),
        (
            F.sum(F.size(tokenize(text_col))).cast("double") / F.count("*")
        ).alias("avgdl"),
    )


def query_table(spark, queries: list[tuple[str, list[str]]]) -> DataFrame:
    """(query_id, term) literal table, built JVM-side (explode of a
    struct-array literal). `spark.createDataFrame` would route the
    literals through applySchemaToPythonRDD and spin Python worker
    processes for a handful of constants — measured at multiple
    seconds of cold-start in the bench."""
    if not any(terms for _, terms in queries):
        # F.array() with zero elements cannot star-expand; an empty
        # query list is a caller bug, not an empty result.
        raise ValueError("query_table needs at least one (query_id, terms) with terms")
    rows = F.array(*[
        F.struct(F.lit(qid).alias("query_id"), F.lit(t).alias("term"))
        for qid, terms in queries
        for t in terms
    ])
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k docs per query by BM25(odds-idf), k1=1.2, b=0.75.

    idf_odds(t) = (N - df + 0.5) / (df + 0.5)
    tf_norm(t,d) = tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl/avgdl))
    score(q,d)  = Σ_t∈q dec18_9(idf_odds · tf_norm)

    Scan budget: ONE corpus scan for the pruned postings (plus one
    aggregate-only scan for (n, avgdl) unless a precomputed `stats`
    frame is passed — at 100 TB corpus stats belong to the snapshot,
    not the query). Document frequency comes from a window over the
    already-pruned candidate postings, never a second corpus pass.
    """
    spark = docs.sparkSession
    all_terms = sorted({t for _, terms in queries for t in terms})
    p = postings(docs, id_col, text_col, terms=all_terms)
    if stats is None:
        stats = corpus_stats(docs, text_col)
    # df(term) = #docs containing it = rows per term in p (already one
    # row per (doc, term)); the window exchange carries hits only.
    p = p.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    qdf = query_table(spark, queries)
    cand = p.join(F.broadcast(qdf), "term").crossJoin(F.broadcast(stats))
    idf = (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_norm = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        cand.select(
            "query_id", "doc_id", (idf * tf_norm).cast(SCORE_DEC).alias("ts")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ts").alias("score_dec"), F.count("*").alias("n_terms_hit"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.col("score_dec").cast("double").alias("score"),
            "n_terms_hit",
        )
    )
