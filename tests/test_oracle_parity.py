"""Local replica of the driver's correctness gate: every workload query
runs on Spark and on DuckDB, and results must match exactly (row count,
columns, order-insensitive values — floats bit-equal thanks to the
DECIMAL-aggregation rule in workload.py)."""

from __future__ import annotations

import pytest

from monolith_spark.workload import all_queries
from monolith_spark.testing import run_parity

NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, sf_dir, name):
    problems = run_parity(spark, sf_dir, name)
    assert not problems, f"{name}: {problems}"


def test_every_query_nonempty(spark, sf_dir):
    # EVERY registry query must return rows even at the smallest sf —
    # a 0-row result passes any hash comparison trivially while
    # proving nothing, so emptiness itself is a failure.
    empty = [
        name for name, q in sorted(all_queries().items())
        if q.spark_fn(spark, sf_dir).limit(1).count() == 0
    ]
    assert not empty, f"queries with no rows at {sf_dir}: {empty}"
