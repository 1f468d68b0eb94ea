"""monolith-spark: a PySpark-native time-series engine.

From-scratch rebuild of the query/data-processing capabilities of
TommyCpp/monolith (a Rust Prometheus remote-storage TSDB) on idiomatic
Spark: a ``series`` dimension (content-hash ids of the canonical sorted
label set) plus a time-bucket-partitioned ``samples`` fact, with queries
expressed as plain DataFrame plans so Catalyst supplies partition
pruning, predicate pushdown, and parallel conjunctive-matcher
evaluation that the reference hand-rolls.

See SURVEY.md for the full operator inventory with file:line citations
into /root/reference.
"""

from monolith_spark.labels import (
    SAMPLES_SCHEMA,
    matcher_predicate,
    series_id_expr,
    signature_expr,
    signature_sql,
    superset_predicate,
)
from monolith_spark.engine import MonolithDB, QueryMatcher
from monolith_spark.session import get_spark

__all__ = [
    "SAMPLES_SCHEMA",
    "MonolithDB",
    "QueryMatcher",
    "get_spark",
    "matcher_predicate",
    "series_id_expr",
    "signature_expr",
    "signature_sql",
    "superset_predicate",
]

__version__ = "0.1.0"
