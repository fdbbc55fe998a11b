"""SparkSession construction and per-session configuration.

Two entry points:

* :func:`get_spark` — build a session for standalone runs (tests, bench).
* :func:`configure` — apply the runtime-settable configs this engine needs
  to an *existing* session (the correctness driver owns its own session and
  passes it in; we must not assume builder-time configs).

Scale notes (100 TB target): shuffle partitions default to the local core
count here, but on a real cluster they should be sized so each shuffle
partition is ~128-256 MB; AQE's coalescePartitions then trims the tail.
AQE skew-join handles hot keys without manual salting for the join paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL configs every query in this engine relies on.
#: Applied defensively by plan entry points because the grading driver
#: constructs its own SparkSession.
RUNTIME_CONFS: dict[str, str] = {
    # The driver's events.parquet stores TIMESTAMP(NANOS) which the Spark
    # parquet reader rejects; read as raw nanos and convert explicitly
    # (catalog.load_events handles the conversion; DuckDB truncates
    # nanos->micros, and `ts DIV 1000` matches that truncation exactly).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics for oracle comparison.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Catalyst filter pushdown into Python data sources (4.1+): lets the
    # versioned_table batch reader turn plain .filter predicates into
    # manifest-stats file pruning (sources/versioned_table.py).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONFS` to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        spark.conf.set(key, value)
    return spark


def default_parallelism() -> int:
    """Core count the harness asks us to use (SPARK_GRAFT_CPUS, default 32)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "wrtd_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session tuned for this container.

    local[N] is one JVM with N executor threads; ``spark.driver.memory`` is
    the only memory knob. On a cluster the same engine code runs unchanged —
    only this builder differs.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed (co-located) tables land here, not in the repo cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/wrtd-spark-warehouse"),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
