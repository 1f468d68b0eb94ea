"""Privacy-preserving aggregate release: k-anonymity / l-diversity.

The export side of a training-data pipeline: before event aggregates
leave the platform (dashboards, partner feeds, public datasets), every
released row must be backed by enough distinct users that no
individual is identifiable from the quasi-identifier combination
(Sweeney's k-anonymity), and optionally by enough distinct sensitive
values that the group doesn't reveal everyone's attribute by
uniformity (Machanavajjhala's l-diversity).

Complements text.pii_scan (row-level redaction) with group-level
suppression. Pure aggregation — one groupBy over the quasi-identifier
columns, map-side combinable, linear at any event volume; the
suppression predicate is a post-aggregation filter on counts, so
Catalyst keeps the whole release plan in one shuffle.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymous_release(
    df: DataFrame,
    quasi_cols: list[str | Column],
    user_col: str = "user_id",
    k: int = 5,
    sensitive_col: str | Column | None = None,
    l_diversity: int | None = None,
    aggs: list[Column] | None = None,
    adaptive: bool = False,
    min_k: int = 1,
    min_l: int = 1,
    reveal_thresholds: bool = False,
) -> DataFrame:
    """Aggregate ``df`` by ``quasi_cols`` and release ONLY groups with
    at least ``k`` distinct ``user_col`` values; when ``sensitive_col``
    (a column name or derived expression) and ``l_diversity`` are
    given, additionally require that many distinct sensitive values in
    the group.

    Returns the released groups with [*quasi_cols, n_users, n_events,
    (n_sensitive,) *aggs] — suppressed groups are absent, which is the
    point: no row, no leak. Extra released statistics ride along via
    ``aggs`` (already-aliased aggregate Columns).

    ``adaptive=True`` floors each threshold to the strongest bound the
    data can satisfy — k_eff = least(k, max n_users over groups), then
    l_eff = least(l, max n_sensitive over the k-released groups) — so a
    non-empty input always yields a non-empty release. That is the
    right contract for exploratory tiers and small fixtures where fixed
    thresholds would suppress everything; a hardened export should keep
    the default strict bounds (releasing nothing IS the safe outcome).
    The effective thresholds come from two single-row aggregates
    cross-joined back (1-row broadcast each); the repeated group
    subtree shares one shuffle via exchange reuse, so the plan stays
    one events-scan wide at any scale.

    Adaptive flooring can silently degrade all the way to k_eff=1
    (per-user groups) with nothing in the output marking it — so:
    ``min_k`` / ``min_l`` put a hard floor under the adaptive bounds
    (k_eff never drops below min_k even if the release comes back
    empty — set min_k=k to turn adaptive into strict), and
    ``reveal_thresholds=True`` keeps the ``__k_eff`` (and ``__l_eff``)
    columns in the released rows so a consumer can distinguish an
    exploratory release from a hardened one. A static warning is
    logged whenever adaptive mode is active.
    """
    if sensitive_col is not None:
        sens = sensitive_col if isinstance(sensitive_col, Column) else F.col(sensitive_col)
        extra = [F.count_distinct(sens).alias("n_sensitive")]
    else:
        extra = []
    g = df.groupBy(*quasi_cols).agg(
        F.count_distinct(F.col(user_col)).alias("n_users"),
        F.count("*").alias("n_events"),
        *extra,
        *(aggs or []),
    )
    if not adaptive:
        cond = F.col("n_users") >= k
        if sensitive_col is not None and l_diversity is not None:
            cond = cond & (F.col("n_sensitive") >= l_diversity)
        return g.filter(cond)
    logging.getLogger(__name__).warning(
        "k_anonymous_release(adaptive=True): effective thresholds may "
        "floor below k=%d/l=%s on sparse data (hard floor min_k=%d/"
        "min_l=%d); pass reveal_thresholds=True to carry __k_eff/"
        "__l_eff in the release, or use the strict default for "
        "hardened exports.",
        k, l_diversity, min_k, min_l,
    )
    kb = g.agg(
        F.greatest(F.lit(min_k), F.least(F.lit(k), F.max("n_users"))).alias(
            "__k_eff"
        )
    )
    kg = g.crossJoin(F.broadcast(kb)).filter(
        F.col("n_users") >= F.col("__k_eff")
    )
    if not reveal_thresholds:
        kg = kg.drop("__k_eff")
    if sensitive_col is None or l_diversity is None:
        return kg
    lb = kg.agg(
        F.greatest(
            F.lit(min_l), F.least(F.lit(l_diversity), F.max("n_sensitive"))
        ).alias("__l_eff")
    )
    out = kg.crossJoin(F.broadcast(lb)).filter(
        F.col("n_sensitive") >= F.col("__l_eff")
    )
    return out if reveal_thresholds else out.drop("__l_eff")


def suppression_report(
    df: DataFrame,
    quasi_cols: list[str | Column],
    user_col: str = "user_id",
    k: int = 5,
) -> DataFrame:
    """One row auditing what a k-anonymous release withholds:
    [n_groups, n_released, n_suppressed, suppressed_event_frac] — the
    coverage cost of the privacy bound, computable without ever
    materializing the suppressed rows downstream."""
    g = df.groupBy(*quasi_cols).agg(
        F.count_distinct(F.col(user_col)).alias("n_users"),
        F.count("*").alias("n_events"),
    )
    rel = F.col("n_users") >= k
    return g.agg(
        F.count("*").alias("n_groups"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("long").alias("n_released"),
        F.sum(F.when(rel, 0).otherwise(1)).cast("long").alias("n_suppressed"),
        (
            F.sum(F.when(~rel, F.col("n_events")).otherwise(0)).cast("double")
            / F.sum("n_events")
        ).alias("suppressed_event_frac"),
    )
