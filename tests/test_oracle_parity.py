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


def test_every_query_nonempty_somewhere(spark, sf_dir):
    # Smoke: flagship queries should return rows at the smallest sf
    # (sparse point-lookups are allowed to be empty).
    must_be_nonempty = [
        "ts_superset_eq", "ts_series_agg", "ts_label_values",
        "tpch_q1", "tpch_nation_revenue", "topk_orders_per_customer",
    ]
    for name in must_be_nonempty:
        q = all_queries()[name]
        assert q.spark_fn(spark, sf_dir).limit(1).count() > 0, name
