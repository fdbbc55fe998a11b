"""Streaming temporal enrichment (streaming/enrich.py): events AS-OF a
changing SCD2 dimension, exactly-once, with dim-version lineage."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    manifest_info,
    read_snapshot,
    write_snapshot,
)
from wrtd_etl_spark.streaming.enrich import (
    enrich_stream,
    make_temporal_enrich_sink,
)

_T0 = dt.datetime(2024, 1, 1, 0, 0)


def _ts(h):
    return _T0 + dt.timedelta(hours=h)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, status string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_stream_enrich_as_of_changing_dim(spark, tmp_path):
    dim_t = str(tmp_path / "dim")
    out_t = str(tmp_path / "out")
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # dim v0: user 1 is 'bronze' from t0
    write_snapshot(_dim(spark, [(1, "bronze", _ts(0), None, True)]), dim_t)

    def run():
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp"
        ).parquet(watch)
        q = enrich_stream(
            stream, dim_t, out_t, "user_id", "k", "ts", ckpt
        )
        q.awaitTermination()

    _events(spark, [(1, 1, _ts(1)), (2, 1, _ts(2))]).coalesce(1).write.mode(
        "append"
    ).parquet(watch)
    run()

    # dim advances: bronze closed at t3, silver opens
    write_snapshot(
        _dim(
            spark,
            [
                (1, "bronze", _ts(0), _ts(3), False),
                (1, "silver", _ts(3), None, True),
            ],
        ),
        dim_t,
    )
    # batch 2 straddles the dim change: one event in each validity window
    _events(spark, [(3, 1, _ts(2)), (4, 1, _ts(5))]).coalesce(1).write.mode(
        "append"
    ).parquet(watch)
    run()

    got = {
        r.event_id: r.status
        for r in read_snapshot(spark, out_t).collect()
    }
    assert got == {1: "bronze", 2: "bronze", 3: "bronze", 4: "silver"}
    # lineage: the second commit records the dim version it joined
    info = manifest_info(out_t)["extra"]
    assert info["dim_version"] == 1
    assert "batch_id" in info


def test_enrich_sink_replay_is_noop(spark, tmp_path):
    dim_t = str(tmp_path / "dim")
    out_t = str(tmp_path / "out")
    write_snapshot(_dim(spark, [(1, "bronze", _ts(0), None, True)]), dim_t)
    sink = make_temporal_enrich_sink(dim_t, out_t, "user_id", "k", "ts")
    batch = _events(spark, [(1, 1, _ts(1))])
    sink(batch, 0)
    sink(batch, 0)  # at-least-once replay
    assert read_snapshot(spark, out_t).count() == 1
    sink(_events(spark, [(2, 1, _ts(2))]), 1)
    assert read_snapshot(spark, out_t).count() == 2
    # facts with no matching dim key survive with NULL attributes
    sink(_events(spark, [(3, 99, _ts(2))]), 2)
    rows = {r.event_id: r.status for r in read_snapshot(spark, out_t).collect()}
    assert rows[3] is None


def test_enrich_keeps_key_when_fact_and_dim_share_name(spark, tmp_path):
    """fact_key == dim_key (the common case): the output must keep the
    FACT's key column — a name-based drop would remove both copies."""
    dim_t = str(tmp_path / "dim")
    out_t = str(tmp_path / "out")
    write_snapshot(
        spark.createDataFrame(
            [(1, "bronze", _ts(0), None, True)],
            "user_id long, status string, valid_from timestamp,"
            " valid_to timestamp, is_current boolean",
        ),
        dim_t,
    )
    sink = make_temporal_enrich_sink(dim_t, out_t, "user_id", "user_id", "ts")
    sink(_events(spark, [(1, 1, _ts(1)), (2, 99, _ts(1))]), 0)
    out = read_snapshot(spark, out_t)
    assert "user_id" in out.columns
    rows = {r.event_id: (r.user_id, r.status) for r in out.collect()}
    assert rows == {1: (1, "bronze"), 2: (99, None)}
