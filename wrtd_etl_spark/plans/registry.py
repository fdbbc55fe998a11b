"""Registry mapping query names → (PySpark callable, DuckDB oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` and
``oracle_sql()``; tests iterate it the same way the grading driver does.

Contract (driver): each callable takes (spark, sf_dir) and returns a
DataFrame; the oracle is ANSI SQL DuckDB runs on the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names are compared after sorting, so every
computed column is aliased identically on both sides. Oracle ``None`` marks
a genuinely non-SQL-expressible op (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return wrap
