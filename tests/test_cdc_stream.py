"""CDC → SCD2 → versioned streaming pipeline (streaming/cdc.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.operators.scd2 import scd2_from_changelog
from wrtd_etl_spark.sources.versioned import history, read_snapshot
from wrtd_etl_spark.streaming.cdc import (
    make_scd2_batch_folder,
    run_cdc_scd2_stream,
)


def _log(spark):
    return load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderstatus").alias("st"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
    )


def _key(r):
    return (r.ck, r.st, r.valid_from, r.valid_to, r.is_current)


def test_batch_folder_fold_equals_rebuild_with_versions(spark, tmp_path):
    """Driving the foreachBatch function directly with 3 time-ordered
    batches must equal a full rebuild AND leave one committed version
    per batch (time travel across CDC history)."""
    table = str(tmp_path / "dim")
    log = _log(spark).cache()
    days = sorted(r.d for r in log.select("d").distinct().collect())
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    batches = [
        log.filter(F.col("d") <= F.lit(cuts[0])),
        log.filter(
            (F.col("d") > F.lit(cuts[0])) & (F.col("d") <= F.lit(cuts[1]))
        ),
        log.filter(F.col("d") > F.lit(cuts[1])),
    ]
    fold = make_scd2_batch_folder(table, ["ck"], ["d", "k"], ["st"])
    for i, b in enumerate(batches):
        fold(b, i)
    got = sorted(map(_key, read_snapshot(spark, table).collect()))
    want = sorted(
        map(_key, scd2_from_changelog(log, ["ck"], ["d", "k"], ["st"]).collect())
    )
    assert got == want
    versions = [h["version"] for h in history(table)]
    assert versions == [2, 1, 0]
    # version 0 equals the first batch's standalone history
    v0 = sorted(map(_key, read_snapshot(spark, table, version=0).collect()))
    b0 = sorted(
        map(
            _key,
            scd2_from_changelog(batches[0], ["ck"], ["d", "k"], ["st"]).collect(),
        )
    )
    assert v0 == b0
    # empty batch commits nothing
    fold(batches[0].limit(0), 99)
    assert [h["version"] for h in history(table)] == [2, 1, 0]


def test_streaming_e2e_single_batch(spark, tmp_path):
    """Plumbing test: a real readStream → foreachBatch → versioned table
    run (availableNow, one file = one batch)."""
    src = str(tmp_path / "src")
    _log(spark).write.parquet(src)
    table = str(tmp_path / "dim")
    stream = spark.readStream.schema(
        "ck bigint, st string, d date, k bigint"
    ).parquet(src)
    run_cdc_scd2_stream(
        stream, table, ["ck"], ["d", "k"], ["st"], str(tmp_path / "ckpt")
    )
    got = sorted(map(_key, read_snapshot(spark, table).collect()))
    want = sorted(
        map(
            _key,
            scd2_from_changelog(_log(spark), ["ck"], ["d", "k"], ["st"]).collect(),
        )
    )
    assert got == want


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between write_snapshot and
    the checkpoint commit re-delivers the SAME batch (same batch_id) on
    restart. Re-folding it would close each open row at a valid_from
    earlier than its own — the manifest-recorded batch_id must turn the
    replay into a no-op instead."""
    table = str(tmp_path / "dim")
    log = _log(spark)
    days = sorted(r.d for r in log.select("d").distinct().collect())
    cut = days[len(days) // 2]
    b0 = log.filter(F.col("d") <= F.lit(cut))
    b1 = log.filter(F.col("d") > F.lit(cut))
    fold = make_scd2_batch_folder(table, ["ck"], ["d", "k"], ["st"])
    fold(b0, 0)
    fold(b0, 0)  # bootstrap-batch replay
    assert [h["version"] for h in history(table)] == [0]
    fold(b1, 1)
    before = sorted(map(_key, read_snapshot(spark, table).collect()))
    fold(b1, 1)  # replayed delivery of the latest batch
    assert [h["version"] for h in history(table)] == [1, 0]
    assert sorted(map(_key, read_snapshot(spark, table).collect())) == before
