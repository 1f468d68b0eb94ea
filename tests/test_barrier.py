"""The conf-gated lineage barrier (r10 optimization round, VERDICT #8b)
and the non-finite literal-array guard (#8a)."""

from __future__ import annotations

import pytest

from monolith_spark.barrier import barrier


def test_barrier_defaults_to_local_checkpoint(spark):
    df = barrier(spark.range(10), eager=True)
    assert df.count() == 10
    # a checkpointed frame's lineage is truncated to a materialized RDD
    # scan — and no checkpoint-dir write happened (none is configured)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan


def test_barrier_reliable_mode_uses_checkpoint_dir(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.monolith.barrier.reliable", "true")
    try:
        df = barrier(spark.range(7), eager=True)
        assert df.count() == 7
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan
        # reliable checkpoints materialize under the checkpoint dir
        files = list((tmp_path / "ckpt").rglob("*"))
        assert files, "reliable barrier wrote nothing to the checkpoint dir"
    finally:
        spark.conf.set("spark.monolith.barrier.reliable", "false")


def test_lit_dbl_array_rejects_non_finite():
    from monolith_spark.operators.similarity import (
        _lit_dbl_array_sql,
        _lit_dbl_matrix,
    )

    assert "1.5D" in _lit_dbl_array_sql([1.5, -2.0])
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            _lit_dbl_array_sql([1.0, bad])
        with pytest.raises(ValueError, match="non-finite"):
            _lit_dbl_matrix([[1.0], [bad]])
