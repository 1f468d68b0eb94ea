"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship TSDB query at sf0.001; queries() /
oracle_sql() expose the full workload registry (one entry per operator
from SURVEY.md §2 plus the scale-pipeline extensions), implemented in
monolith_spark.workload with DuckDB oracles alongside.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from monolith_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.queries()["ts_superset_eq"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
