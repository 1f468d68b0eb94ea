"""Lineage barriers, with a conf-gated reliability escape hatch.

Every iterative/branching operator in this engine truncates lineage
with ``localCheckpoint`` — blocks live in executor storage, cut the
analysis/replan cost of deep plans, and cost no distributed write. The
tradeoff (guide §5): localCheckpoint blocks are NOT replicated, so on a
real cluster losing an executor makes every dependent job fail — there
is no lineage left to recompute from. On local[*] (one "executor") the
distinction is moot, which is why the default stays local.

``barrier(df, eager=...)`` is the one switch point: set

    spark.monolith.barrier.reliable=true

(and ``spark.sparkContext.setCheckpointDir(...)``) and every barrier in
the engine becomes a RELIABLE ``checkpoint`` — blocks persist to the
checkpoint dir (HDFS/object store), surviving executor loss, at the
cost of one distributed write per barrier. Production guidance in
SCALE.md ("Lineage barriers at cluster scale").

Call sites use ``df.transform(barrier, eager=...)`` so the chained
call shape of the historical ``.localCheckpoint(eager=...)`` is kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage: ``localCheckpoint`` by default, a reliable
    ``checkpoint`` when ``spark.monolith.barrier.reliable=true``."""
    reliable = df.sparkSession.conf.get(
        "spark.monolith.barrier.reliable", "false"
    )
    if str(reliable).lower() == "true":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
