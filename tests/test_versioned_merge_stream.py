"""Exactly-once streaming MERGE sink (streaming/versioned_sink.py):
each micro-batch of CDC ops folds into a versioned table with ONE
atomic merge_into commit — the lake-scale form of the reference's poll
loop (cursor fetch -> INSERT ... ON CONFLICT DO UPDATE,
functions.py:178-183)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.sources.versioned import history, read_snapshot
from wrtd_etl_spark.streaming.versioned_sink import (
    make_versioned_merge_sink,
    run_versioned_merge_stream,
)

SCHEMA = "k long, v string, seq long, op string"


def _sink(table, **kw):
    return make_versioned_merge_sink(
        table,
        ["k"],
        delete_when=F.col("op") == "D",
        order_by=["seq"],
        source_meta_cols=("seq", "op"),
        **kw,
    )


def _apply(truth: dict, ops):
    """Python truth model: per-key latest-seq op wins per batch."""
    last = {}
    for k, v, seq, op in ops:
        if k not in last or seq > last[k][0]:
            last[k] = (seq, v, op)
    for k, (_, v, op) in last.items():
        if op == "D":
            truth.pop(k, None)
        else:
            truth[k] = v
    return truth


def _state(spark, table):
    return {
        r.k: r.v for r in read_snapshot(spark, table).collect()
    }


def test_merge_sink_fold_equals_truth_and_versions(spark, tmp_path):
    table = str(tmp_path / "dim")
    batches = [
        [(1, "a", 1, "I"), (2, "b", 2, "I"), (3, "c", 3, "I")],
        # update 1, delete 2, insert 4
        [(1, "a2", 4, "U"), (2, "b", 5, "D"), (4, "d", 6, "I")],
        # within-batch churn on key 5: insert then delete (delete wins),
        # key 1: two updates (latest seq wins), delete of absent key 9
        [
            (5, "e", 7, "I"),
            (5, "e", 8, "D"),
            (1, "a3", 9, "U"),
            (1, "a4", 10, "U"),
            (9, "zz", 11, "D"),
        ],
    ]
    sink = _sink(table)
    truth: dict = {}
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, SCHEMA), i)
        _apply(truth, rows)
        assert _state(spark, table) == truth
    # one committed version per non-empty batch; meta cols never land
    assert [h["version"] for h in history(table)] == [2, 1, 0]
    assert set(read_snapshot(spark, table).columns) == {"k", "v"}
    # empty batch commits nothing
    sink(spark.createDataFrame([], SCHEMA), 99)
    assert [h["version"] for h in history(table)] == [2, 1, 0]


def test_merge_sink_replay_is_noop(spark, tmp_path):
    table = str(tmp_path / "dim")
    sink = _sink(table)
    sink(spark.createDataFrame([(1, "a", 1, "I")], SCHEMA), 0)
    b1 = [(1, "a2", 2, "U"), (2, "b", 3, "I")]
    sink(spark.createDataFrame(b1, SCHEMA), 1)
    want = _state(spark, table)
    versions = [h["version"] for h in history(table)]
    # at-least-once replay of the SAME batch id: no new version, no churn
    sink(spark.createDataFrame(b1, SCHEMA), 1)
    assert [h["version"] for h in history(table)] == versions
    assert _state(spark, table) == want


def test_merge_sink_streaming_e2e_orders(spark, tmp_path):
    """Real readStream -> foreachBatch -> merged versioned table over
    testdata: the final state is the latest order status per customer,
    which a plain batch aggregate oracles exactly."""
    src = str(tmp_path / "src")
    log = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("v"),
        F.col("o_orderkey").alias("seq"),
        F.lit("U").alias("op"),
    )
    log.write.parquet(src)
    table = str(tmp_path / "dim")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    run_versioned_merge_stream(
        stream,
        table,
        ["k"],
        str(tmp_path / "ckpt"),
        delete_when=F.col("op") == "D",
        order_by=["seq"],
        source_meta_cols=("seq", "op"),
    )
    want = {
        r.k: r.v
        for r in log.groupBy("k")
        .agg(F.max_by("v", "seq").alias("v"))
        .collect()
    }
    assert _state(spark, table) == want


def test_merge_sink_mor_strategy(spark, tmp_path):
    """r8: strategy='auto' gives CDC micro-batches the merge-on-read
    plan — post-bootstrap commits are merge_dv (vectors + one small
    segment, zero existing data files move), the fold equals the CoW
    twin exactly, and the batch-id ledger still dedups replays."""
    import glob
    import os

    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    batches = [
        [(k, f"v{k}", k, "I") for k in range(100)],
        [(1, "u1", 200, "U"), (2, "x", 201, "D"), (300, "n", 202, "I")],
        [(1, "u2", 300, "U"), (300, "n2", 301, "U"), (5, "x", 302, "D")],
    ]
    s_cow = _sink(cow)
    s_mor = _sink(mor, strategy="auto")
    for i, rows in enumerate(batches):
        s_cow(spark.createDataFrame(rows, SCHEMA), i)
        if i == 0:
            s_mor(spark.createDataFrame(rows, SCHEMA), i)
            files_after_boot = set(
                glob.glob(os.path.join(mor, "data", "*", "*.parquet"))
            )
        else:
            s_mor(spark.createDataFrame(rows, SCHEMA), i)
    assert _state(spark, mor) == _state(spark, cow)
    # post-bootstrap commits are merge-on-read and moved no base files
    assert [h["mode"] for h in history(mor)[:2]] == [
        "merge_dv",
        "merge_dv",
    ]
    assert files_after_boot <= set(
        glob.glob(os.path.join(mor, "data", "*", "*.parquet"))
    )
    # replayed delivery: ledger no-op
    v = history(mor)[0]["version"]
    s_mor(spark.createDataFrame(batches[2], SCHEMA), 2)
    assert history(mor)[0]["version"] == v
