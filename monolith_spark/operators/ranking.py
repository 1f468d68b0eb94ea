"""Exact distributed ranking — global row_number / ntile / running sums
WITHOUT a single-partition window.

`Window.orderBy(...)` with no partitionBy plans `Exchange SinglePartition`:
the entire relation funnels through ONE sort task, which is the worst
remaining scale-killer class in this repo's plan audits (VERDICT r3/r4).
This module replaces that shape with the exact two-pass histogram-offset
device:

  1. bin every row by a deterministic monotone compaction of the sort
     key (``nbins`` equal-width bins over the key's [min, max], computed
     by one 1-row aggregate);
  2. aggregate one (bin → count [, sum(value)]) histogram — ``nbins``
     rows, driver-collected (the bounded IVF-centroid pattern);
  3. turn the histogram into per-bin rank/prefix-sum offsets and
     broadcast them back;
  4. rank within each bin with Window.partitionBy(bin) — shuffle-
     parallel across bins — and add the bin's offset.

The result is bit-identical to the global window (ranks are exact
integers; prefix sums re-associate an exact DECIMAL addition), but the
plan has no SinglePartition exchange: the only full-relation operators
are one histogram aggregation and one hash-partitioned window, both
map-combinable / parallel. Worst case (every key equal) degrades to one
bin = the old plan; real score/revenue/recency keys spread fine.

The input is localCheckpoint'ed eagerly: the device scans it 2-3 times
(stats, histogram, final rank) and re-deriving an expensive upstream
aggregate per pass would triple the real work at 100 TB.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from monolith_spark.barrier import barrier as _lineage_barrier

__all__ = [
    "with_exact_rank",
    "with_exact_ranks",
    "grouped_exact_rank",
    "ntile_expr",
    "ntile_col_expr",
]

_DEC = "decimal(38,6)"


def _bin_expr(key: str, kmin: float, kmax: float, nbins: int) -> Column:
    """Deterministic monotone (non-decreasing in the key) bin id in
    [0, nbins-1]. Equal-width over the observed [min, max]; monotone
    even under double rounding because x -> floor(a·(x-m)) is, and the
    within-bin window re-sorts by the ORIGINAL key so bin collisions
    cost parallelism, never correctness. NULL keys map to a NULL bin
    (never silently to bin 0 — the degenerate equal-range path used
    to constant-fold them there), so callers can detect and reject
    them from the histogram."""
    kd = F.col(key).cast("double")
    if kmax <= kmin:
        return F.when(kd.isNotNull(), F.lit(0)).cast("int")
    raw = F.floor((kd - F.lit(kmin)) / F.lit(kmax - kmin) * F.lit(nbins))
    return F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw)).cast("int")


def with_exact_rank(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    rank_col: str,
    *,
    descending: bool = True,
    value_col: str | None = None,
    cum_col: str | None = None,
    nbins: int = 512,
    domain: tuple[float, float] | None = None,
) -> tuple[DataFrame, int, Decimal | None]:
    """Add the exact global ``row_number() over (order by key
    [desc], *tiebreaks)`` as ``rank_col`` — and, when ``value_col`` /
    ``cum_col`` are given, the exact running ``sum(value_col)`` over
    the same order (DECIMAL(38,6), ``rows unbounded preceding``) —
    with no single-partition exchange in the plan.

    Returns (df, n_rows, grand_total): ``n_rows`` is the exact input
    count (free from the histogram; ntile needs it) and ``grand_total``
    the exact DECIMAL sum of ``value_col`` (None when not requested).
    NULL keys are not supported (callers rank aggregates, which never
    produce them). Pass ``domain=(lo, hi)`` when the key's range is
    known statically (a probability, a bounded score) to skip the
    min/max pass — one fewer scan of the input; keys outside the
    stated domain still rank correctly (bins clamp; within-bin sort is
    on the true key), only bin balance suffers."""
    df = df.transform(_lineage_barrier, eager=True)
    key_order = F.col(key).desc() if descending else F.col(key).asc()
    order = [key_order, *[F.col(t).asc() for t in tiebreaks]]

    if domain is not None:
        lo, hi = float(domain[0]), float(domain[1])
    else:
        stats = df.agg(
            F.min(F.col(key).cast("double")).alias("lo"),
            F.max(F.col(key).cast("double")).alias("hi"),
        ).collect()[0]
        if stats["lo"] is None:  # empty input
            out = df.withColumn(rank_col, F.lit(None).cast("long"))
            if cum_col is not None:
                out = out.withColumn(cum_col, F.lit(None).cast(_DEC))
            return out, 0, (Decimal(0) if value_col is not None else None)
        lo, hi = stats["lo"], stats["hi"]

    if lo != lo or hi != hi:  # NaN min/max — no total order to rank by
        raise ValueError(
            f"with_exact_rank: sort key {key!r} contains NaN; "
            "a NaN key has no rank in a total order — filter or "
            "impute before ranking"
        )
    b = _bin_expr(key, lo, hi, nbins)
    binned = df.withColumn("__b", b)
    aggs = [F.count("*").alias("__c")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast(_DEC)).alias("__s"))
    hist = {
        r["__b"]: r
        for r in binned.groupBy("__b").agg(*aggs).collect()  # <= nbins rows
    }
    if None in hist:  # NULL sort key binned to NULL
        raise ValueError(
            f"with_exact_rank: sort key {key!r} contains NULLs; "
            "NULL keys are unsupported (callers rank aggregates) — "
            "filter them or coalesce to a sentinel first"
        )

    # Offsets accumulate over bins that precede a bin IN SORT ORDER:
    # bins are monotone ascending in the key, so descending order walks
    # them high-to-low. A bin whose value_col is entirely NULL sums to
    # SQL NULL — it contributes 0 to downstream offsets (matching the
    # running window, which skips NULL addends).
    bins_in_order = sorted(hist, reverse=descending)
    rows = []
    run_c, run_s = 0, Decimal(0)
    for bb in bins_in_order:
        rows.append((bb, run_c, str(run_s)))
        run_c += hist[bb]["__c"]
        if value_col is not None and hist[bb]["__s"] is not None:
            run_s += hist[bb]["__s"]
    n_rows = run_c
    total = run_s if value_col is not None else None

    # The offset table is driver-known and <= nbins entries: inline it
    # as ONE parsed literal map instead of createDataFrame + broadcast
    # join — a createDataFrame pays ~0.2 s of py4j/RDD setup per call
    # and the join adds a whole stage; element_at(map, __b) is a pure
    # narrow expression with identical values (every bin present in the
    # data is a key by construction, so ANSI element_at never misses).
    off_map = F.expr(
        "map(" + ",".join(f"{bb},{off}L" for bb, off, _ in rows) + ")"
    )
    w = Window.partitionBy("__b").orderBy(*order)
    out = binned.withColumn(
        rank_col,
        (F.element_at(off_map, F.col("__b")) + F.row_number().over(w)).cast(
            "long"
        ),
    )
    if cum_col is not None:
        soff_map = F.expr(
            "map("
            + ",".join(
                f"{bb},CAST('{s}' AS DECIMAL(38,6))" for bb, _, s in rows
            )
            + ")"
        )
        cum = F.sum(F.col(value_col).cast(_DEC)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            cum_col, (F.element_at(soff_map, F.col("__b")) + cum).cast(_DEC)
        )
    return out.drop("__b"), n_rows, total


def with_exact_ranks(
    df: DataFrame,
    specs: list[tuple[str, list[str], str]],
    *,
    descending: bool = True,
    nbins: int = 512,
) -> tuple[DataFrame, int]:
    """Exact global ranks over SEVERAL sort keys of the same relation
    (the RFM shape: quintile rank per recency/frequency/monetary) with
    ONE materialization: the input is checkpointed once, every key's
    histogram is a column-pruned scan of that checkpoint, and the rank
    columns chain as bin-join + per-bin window — versus calling
    with_exact_rank per key, which re-checkpoints each intermediate
    (k-1 extra full-table materializations).

    ``specs``: (key, tiebreaks, rank_col) triples. Returns
    (df_with_rank_cols, n_rows)."""
    base = df.transform(_lineage_barrier, eager=True)
    # one stats pass for ALL keys (not one 1-row job per key)
    stats = base.agg(
        *[
            a
            for i, (key, _, _) in enumerate(specs)
            for a in (
                F.min(F.col(key).cast("double")).alias(f"lo{i}"),
                F.max(F.col(key).cast("double")).alias(f"hi{i}"),
            )
        ]
    ).collect()[0]
    if stats["lo0"] is None:  # empty input
        return (
            base.select(
                "*", *[F.lit(None).cast("long").alias(rc) for _, _, rc in specs]
            ),
            0,
        )
    bin_exprs = []
    for i, (key, _, _) in enumerate(specs):
        lo_i, hi_i = stats[f"lo{i}"], stats[f"hi{i}"]
        if lo_i != lo_i or hi_i != hi_i:  # NaN
            raise ValueError(
                f"with_exact_ranks: sort key {key!r} contains NaN; "
                "a NaN key has no rank in a total order"
            )
        bin_exprs.append(_bin_expr(key, lo_i, hi_i, nbins))
    # ONE histogram job for ALL keys (vs one collect job per key):
    # each row explodes into (spec_idx, bin) pairs and a single
    # count-by-both aggregation serves every spec — ≤ len(specs)·nbins
    # rows collected either way, len(specs)-1 fewer blocking jobs.
    hists: list[dict] = [{} for _ in specs]
    for r in (
        base.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("i"), b.alias("b"))
                        for i, b in enumerate(bin_exprs)
                    ]
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"), F.col("e.b").alias("b"))
        .agg(F.count("*").alias("__c"))
        .collect()
    ):
        hists[r["i"]][r["b"]] = r["__c"]
    out = base
    n_rows = 0
    for i, (key, tiebreaks, rank_col) in enumerate(specs):
        order = [
            F.col(key).desc() if descending else F.col(key).asc(),
            *[F.col(t).asc() for t in tiebreaks],
        ]
        b = bin_exprs[i]
        bcol, ocol = f"__b{i}", f"__off{i}"
        hist = hists[i]
        if None in hist:
            raise ValueError(
                f"with_exact_ranks: sort key {key!r} contains NULLs; "
                "NULL keys are unsupported — filter or coalesce first"
            )
        run_c = 0
        rows = []
        for bb in sorted(hist, reverse=descending):
            rows.append((bb, run_c))
            run_c += hist[bb]
        n_rows = run_c
        # literal offset map per spec (see with_exact_rank): no
        # createDataFrame, no broadcast-join stage
        off_map = F.expr(
            "map(" + ",".join(f"{bb},{off}L" for bb, off in rows) + ")"
        )
        w = Window.partitionBy(bcol).orderBy(*order)
        out = (
            out.withColumn(bcol, b)
            .withColumn(
                rank_col,
                (
                    F.element_at(off_map, F.col(bcol)) + F.row_number().over(w)
                ).cast("long"),
            )
            .drop(bcol)
        )
    return out, n_rows


def grouped_exact_rank(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str],
    rank_col: str,
    *,
    descending: bool = True,
    nbins: int = 512,
    domain: tuple[float, float] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Exact per-group ``row_number() over (partition by group order by
    key [desc], *tiebreaks)`` — the per-language/per-domain rank a
    CCNet-style pipeline needs — WITHOUT per-group corpus sorts: a
    plain ``Window.partitionBy(source)`` funnels each group's entire
    doc set through one task when groups are few (the few-partition
    window trap).

    Fully declarative (no driver collect, unlike with_exact_rank): the
    (group, bin) histogram is compact (≤ nbins rows per group), its
    per-group running sum over ``bin`` IS the rank offset table, and
    the offsets join back on (group, bin) — unhinted, so AQE
    broadcasts while the histogram measures small. The final window
    partitions by (group, bin): parallelism = groups × occupied bins.
    ``count_col`` additionally attaches the exact per-group row count
    (ntile needs it). Keys must be non-null; bins come from the global
    [min, max] (or static ``domain``) — per-group key ranges only
    affect bin balance, never correctness."""
    df = df.transform(_lineage_barrier, eager=True)
    if domain is not None:
        lo, hi = float(domain[0]), float(domain[1])
    else:
        stats = df.agg(
            F.min(F.col(key).cast("double")).alias("lo"),
            F.max(F.col(key).cast("double")).alias("hi"),
        ).collect()[0]
        if stats["lo"] is None:  # empty input
            out = df.withColumn(rank_col, F.lit(None).cast("long"))
            if count_col is not None:
                out = out.withColumn(count_col, F.lit(None).cast("long"))
            return out
        lo, hi = stats["lo"], stats["hi"]
    b = _bin_expr(key, lo, hi, nbins)
    binned = df.withColumn("__b", b)
    h = binned.groupBy(*group_cols, "__b").agg(F.count("*").alias("__c"))
    wb = Window.partitionBy(*group_cols).orderBy(
        F.col("__b").desc() if descending else F.col("__b").asc()
    )
    offs = h.select(
        *group_cols,
        "__b",
        (F.sum("__c").over(wb) - F.col("__c")).alias("__off"),
        F.sum("__c").over(Window.partitionBy(*group_cols)).alias("__grp_n"),
    )
    w = Window.partitionBy(*group_cols, "__b").orderBy(
        F.col(key).desc() if descending else F.col(key).asc(),
        *[F.col(t).asc() for t in tiebreaks],
    )
    out = binned.join(offs, [*group_cols, "__b"]).withColumn(
        rank_col, (F.col("__off") + F.row_number().over(w)).cast("long")
    )
    if count_col is not None:
        out = out.withColumn(count_col, F.col("__grp_n").cast("long"))
    return out.drop("__b", "__off", "__grp_n")


def ntile_col_expr(rank_col: str, n_col: str, n: int) -> Column:
    """``ntile(n)`` from an exact 1-based rank and a RUNTIME row-count
    column (per-group counts from grouped_exact_rank) — the SQL-standard
    closed-form tile assignment in pure integer arithmetic."""
    return F.expr(
        f"CAST(CASE"
        f" WHEN {n_col} div {n} = 0 THEN {rank_col}"
        f" WHEN {rank_col} <= ({n_col} div {n} + 1) * ({n_col} % {n})"
        f"   THEN ({rank_col} - 1) div ({n_col} div {n} + 1) + 1"
        f" ELSE ({n_col} % {n})"
        f"   + ({rank_col} - ({n_col} div {n} + 1) * ({n_col} % {n}) - 1)"
        f"     div ({n_col} div {n}) + 1"
        f" END AS BIGINT)"
    )


def ntile_expr(rank_col: str, n_rows: int, n: int) -> Column:
    """``ntile(n)`` from an exact 1-based global rank — the closed-form
    SQL-standard tile assignment (first ``n_rows mod n`` tiles get one
    extra row), so callers replace the global-window ntile without any
    behavior change."""
    q, r = divmod(n_rows, n)
    rnk = F.col(rank_col)
    if q == 0:  # fewer rows than tiles: tile == rank
        return rnk.cast("long")
    big = (q + 1) * r  # rows living in the r larger tiles
    return (
        F.when(rnk <= F.lit(big), F.expr(f"({rank_col} - 1) div {q + 1}") + 1)
        .otherwise(F.lit(r) + F.expr(f"({rank_col} - {big} - 1) div {q}") + 1)
        .cast("long")
    )
