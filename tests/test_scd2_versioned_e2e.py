"""End-to-end: CDC changelog batches → SCD2 incremental merge →
versioned snapshot commits → time-travel reads and rollback.

The composition a real warehouse runs nightly: each batch folds into
the dimension history (operators/scd2.py) and commits as a NEW pinned
version (sources/versioned.py), so any past state of the dimension is
reproducible — the property the reference's in-place Postgres upsert
(functions.py:178-183) cannot offer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.operators.scd2 import scd2_from_changelog, scd2_merge
from wrtd_etl_spark.sources.versioned import (
    read_snapshot,
    rollback,
    write_snapshot,
)


def test_cdc_to_scd2_to_versioned_time_travel(spark, tmp_path):
    table = str(tmp_path / "dim_customer_status")
    log = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderstatus").alias("st"),
            F.to_date("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
        )
        .cache()
    )
    days = sorted(r.d for r in log.select("d").distinct().collect())
    cut = days[len(days) // 2]

    hist0 = scd2_from_changelog(
        log.filter(F.col("d") <= F.lit(cut)), ["ck"], ["d", "k"], ["st"]
    )
    v0 = write_snapshot(hist0, table)
    merged = scd2_merge(
        read_snapshot(spark, table),
        log.filter(F.col("d") > F.lit(cut)),
        ["ck"],
        ["d", "k"],
        ["st"],
    )
    v1 = write_snapshot(merged, table)
    assert (v0, v1) == (0, 1)

    # latest version == a full rebuild over the whole changelog
    def key(r):
        return (r.ck, r.st, r.valid_from, r.valid_to, r.is_current)

    full = sorted(
        map(key, scd2_from_changelog(log, ["ck"], ["d", "k"], ["st"]).collect())
    )
    assert sorted(map(key, read_snapshot(spark, table).collect())) == full

    # time travel reproduces the pre-merge state bit-for-bit
    assert sorted(map(key, read_snapshot(spark, table, version=0).collect())) == sorted(
        map(key, hist0.collect())
    )

    # rollback: latest points at v0's content again, history intact
    rollback(table, 0)
    assert sorted(map(key, read_snapshot(spark, table).collect())) == sorted(
        map(key, hist0.collect())
    )
    assert sorted(map(key, read_snapshot(spark, table, version=1).collect())) == full
