"""Loaders for the driver's parquet test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's reader
rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` we read raw int64
nanos and convert with integer division (``ts DIV 1000`` — truncation, which
is exactly what DuckDB does when it narrows nanos to its micro timestamps,
so oracle comparisons line up bit-for-bit).

All loads are plain ``spark.read.parquet`` — predicate pushdown, column
pruning and row-group skipping come for free from the declarative plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing ingest quirks.

    ``events``: nanos int64 -> TIMESTAMP_NTZ (micro precision, truncated —
    matches DuckDB's read of the same file).
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def spread(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Ensure enough input parallelism for a CPU-bound downstream stage.

    A Spark scan parallelizes by file split, and a parquet file is only
    splittable at row-group boundaries — so a small single-row-group file
    yields ONE task, and everything up to the first exchange (shingling,
    signature computation, vector scoring) serializes on one core no
    matter how many executors exist. At 100 TB a scan has thousands of
    splits and this returns the input unchanged (the gate keeps it a
    policy no-op); on degenerate inputs it buys full-cluster parallelism
    for one round-robin exchange of the raw rows — measured 32× stage
    speedup on the single-file local testdata.

    Only worth it when the next stage is CPU-heavy: plain filters or
    aggregations are cheaper than the exchange they'd need.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * min_fraction)):
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
