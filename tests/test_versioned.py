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


def test_compact_preserves_rows_and_history(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import compact, data_file_count

    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        write_snapshot(
            spark.range(lo, lo + 5).repartition(4).withColumnRenamed("id", "v"),
            t,
            mode="append" if lo else "overwrite",
        )
    before = data_file_count(t)
    assert before >= 12  # 3 appends x 4 files
    v = compact(spark, t, target_files=1)
    assert v == 3
    assert data_file_count(t) == 1
    assert _vals(read_snapshot(spark, t)) == list(range(5)) + list(
        range(10, 15)
    ) + list(range(20, 25))
    # pre-compaction version still time-travels with the OLD layout
    assert data_file_count(t, version=2) == before
    assert _vals(read_snapshot(spark, t, version=2)) == _vals(
        read_snapshot(spark, t)
    )
    assert history(t)[0]["mode"] == "compact"
    # retention: vacuum drops the small files, compacted table unharmed
    deleted = vacuum(t, keep_last=1)
    assert len(deleted) == before
    assert len(_vals(read_snapshot(spark, t))) == 15


def test_append_schema_evolution_merges_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    import pyspark.sql.functions as F

    write_snapshot(
        spark.range(10, 12)
        .withColumnRenamed("id", "v")
        .withColumn("extra", F.lit("x")),
        t,
        mode="append",
    )
    got = read_snapshot(spark, t)
    assert set(got.columns) == {"v", "extra"}
    rows = {r.v: r.extra for r in got.collect()}
    assert rows[10] == "x" and rows[0] is None  # old rows NULL-fill
    # non-evolved tables never pay the mergeSchema footer pass
    t2 = str(tmp_path / "tbl2")
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    write_snapshot(
        spark.range(2).withColumnRenamed("id", "v"), t2, mode="append"
    )
    import json as _json
    import os as _os

    with open(_os.path.join(t2, "_manifests", "v1.json")) as f:
        assert _json.load(f)["schema_evolved"] is False


def test_rollback_carries_schema_evolution_and_extra(spark, tmp_path):
    """Restoring an append-evolved version must keep mergeSchema on (or
    the evolved columns silently vanish) and carry the target's extra
    metadata; a later append must inherit evolved=True."""
    from wrtd_etl_spark.sources.versioned import manifest_info

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "v long, s string"),
        t,
        extra={"tag": "base"},
    )
    write_snapshot(
        spark.createDataFrame([(2, "b", 9.5)], "v long, s string, x double"),
        t,
        mode="append",
        extra={"tag": "evolved"},
    )
    assert manifest_info(t)["schema_evolved"] is True
    # v2: plain overwrite drops back to a narrow schema
    write_snapshot(spark.createDataFrame([(3, "c")], "v long, s string"), t)
    v = rollback(t, 1)
    info = manifest_info(t, v)
    assert info["schema_evolved"] is True
    assert info["extra"] == {"tag": "evolved"}  # consumers index into it
    assert set(read_snapshot(spark, t).columns) == {"v", "s", "x"}
    assert {r.v for r in read_snapshot(spark, t).collect()} == {1, 2}
    # append on top of the restore inherits the evolved flag
    write_snapshot(
        spark.createDataFrame([(4, "d")], "v long, s string"), t, mode="append"
    )
    assert manifest_info(t)["schema_evolved"] is True
    assert "x" in read_snapshot(spark, t).columns
