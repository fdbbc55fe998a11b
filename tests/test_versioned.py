"""Versioned table format (sources/versioned.py): time travel, atomic
commit, non-destructive rollback, vacuum retention."""

from __future__ import annotations

import json
import os

import pytest

from wrtd_etl_spark.sources.versioned import (
    history,
    latest_version,
    read_snapshot,
    rollback,
    vacuum,
    write_snapshot,
)


def _vals(df):
    return sorted(r.v for r in df.collect())


def test_time_travel_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t) == 0
    assert (
        write_snapshot(
            spark.range(10, 12).withColumnRenamed("id", "v"), t, mode="append"
        )
        == 1
    )
    assert (
        write_snapshot(spark.range(5).withColumnRenamed("id", "v"), t) == 2
    )
    assert _vals(read_snapshot(spark, t, version=0)) == [0, 1, 2]
    assert _vals(read_snapshot(spark, t, version=1)) == [0, 1, 2, 10, 11]
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2, 3, 4]
    h = history(t)
    assert [e["version"] for e in h] == [2, 1, 0]
    assert h[1]["mode"] == "append" and h[1]["parent"] == 0


def test_crash_before_pointer_swap_preserves_previous_version(spark, tmp_path):
    """Simulated torn write: data + manifest of a would-be v1 exist but
    the pointer was never swapped — readers must still see v0."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    # fake the crashed writer: orphan data dir + manifest, stale pointer
    orphan = os.path.join(t, "data", "deadbeef")
    os.makedirs(orphan)
    spark.range(100, 103).withColumnRenamed("id", "v").write.parquet(
        orphan, mode="overwrite"
    )
    with open(os.path.join(t, "_manifests", "v1.json"), "w") as f:
        json.dump(
            {
                "version": 1,
                "mode": "overwrite",
                "parent": 0,
                "files": [],
                "schema": {},
                "committed_at": 0,
            },
            f,
        )
    assert latest_version(t) == 0
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    # and the NEXT real commit supersedes the torn v1 cleanly
    v = write_snapshot(spark.range(7, 9).withColumnRenamed("id", "v"), t)
    assert v == 1
    assert _vals(read_snapshot(spark, t)) == [7, 8]


def test_rollback_is_non_destructive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    write_snapshot(spark.range(50, 52).withColumnRenamed("id", "v"), t)
    v = rollback(t, 0)
    assert v == 2
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    # the rolled-over version is still readable (history intact)
    assert _vals(read_snapshot(spark, t, version=1)) == [50, 51]
    assert history(t)[0]["mode"] == "rollback:0"


def test_vacuum_keeps_referenced_files_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    write_snapshot(spark.range(10, 13).withColumnRenamed("id", "v"), t)
    rollback(t, 0)  # latest (v2) references v0's files
    deleted = vacuum(t, keep_last=1)
    assert deleted, "v1's exclusive files should have been deleted"
    # latest still fully readable because rollback shares v0's files
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    with pytest.raises(Exception):
        read_snapshot(spark, t, version=1).collect()
    # keep_last=2 on a fresh table deletes nothing
    t2 = str(tmp_path / "tbl2")
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    assert vacuum(t2, keep_last=2) == []
