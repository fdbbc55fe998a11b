"""Query plans graded by the driver harness.

``registry`` holds the (spark_fn, oracle_sql) catalog; ``testdata_queries``
registers the reference-analog queries over the driver's TPC-H-ish tables;
``replay_queries`` holds the literal eight reference SQL statements over the
replay-domain fixture tables (parity proof).
"""

from .registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
