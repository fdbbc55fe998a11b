"""Commit-log retention (sources/versioned.expire_history): trim old
manifests, degrade history consumers gracefully, reclaim files with
vacuum afterwards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    delta_files,
    commit_modes,
    expire_history,
    history,
    latest_version,
    read_snapshot,
    rollback,
    vacuum,
    version_as_of,
    write_snapshot,
)


def _mk(spark, t, n=6):
    for i in range(n):
        write_snapshot(
            spark.createDataFrame([(i, f"b{i}")], "k long, v string"),
            t,
            mode="append" if i else "overwrite",
        )


def test_expire_trims_log_and_reads_survive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, 6)
    removed = expire_history(t, keep_last=3)
    assert removed == [0, 1, 2]
    assert latest_version(t) == 5
    assert read_snapshot(spark, t).count() == 6  # current state untouched
    # history stops at the horizon instead of crashing
    assert [h["version"] for h in history(t)] == [5, 4, 3]
    # retained time travel still works; expired raises
    assert read_snapshot(spark, t, version=3).count() == 4
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=1)
    with pytest.raises(FileNotFoundError):
        rollback(t, 1)
    # as_of below the horizon names the cause
    with pytest.raises(ValueError, match="retained history"):
        version_as_of(t, 1.0)
    # incremental consumers starting below the horizon: undefined delta
    # (rebuild), classification reports a rewrite
    assert delta_files(t, 0, 5) is None
    assert commit_modes(t, 0, 5) == ["overwrite"]
    assert delta_files(t, 3, 5) is not None  # retained range still folds
    # idempotent
    assert expire_history(t, keep_last=3) == []


def test_expire_then_vacuum_reclaims_orphaned_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "old")], "k long, v string"), t
    )
    write_snapshot(
        spark.createDataFrame([(2, "new")], "k long, v string"), t
    )  # overwrite: v0's file now referenced ONLY by v0's manifest
    assert vacuum(t, keep_last=2, tmp_age_s=0.0) == []
    expire_history(t, keep_last=1)
    removed = vacuum(t, keep_last=1, tmp_age_s=0.0)
    assert removed  # the expired version's exclusive file is reclaimed
    assert read_snapshot(spark, t).count() == 1


def test_table_maintenance_stream_packs_trims_and_vacuums(
    spark, tmp_path
):
    """The feed-driven daemon: appends accrue small files; one bounded
    maintenance run bin-packs them, trims the log, vacuums the orphaned
    bytes — and a second run is a no-op."""
    from wrtd_etl_spark.sources.versioned import (
        data_file_count,
        files_for_read,
        history,
        manifest_info,
    )
    from wrtd_etl_spark.streaming.feed_refresh import (
        run_table_maintenance_stream,
    )

    t = str(tmp_path / "tbl")
    _mk(spark, t, 8)
    assert data_file_count(t) == 8
    run_table_maintenance_stream(
        spark,
        t,
        str(tmp_path / "ck1"),
        compact_above=4,
        small_bytes=1 << 20,
        target_bytes=1 << 30,
        expire_keep_last=3,
        vacuum_keep_last=1,
        vacuum_tmp_age_s=0.0,
    )
    assert manifest_info(t)["mode"] == "compact"
    files, _ = files_for_read(t)
    assert len(files) == 1  # tail packed
    assert len(history(t)) <= 3  # log trimmed
    assert read_snapshot(spark, t).count() == 8  # rows intact
    v = latest_version(t)
    run_table_maintenance_stream(  # healthy table: nothing to do
        spark,
        t,
        str(tmp_path / "ck2"),
        compact_above=4,
        small_bytes=1 << 20,
        expire_keep_last=3,
        vacuum_keep_last=1,
        vacuum_tmp_age_s=0.0,
    )
    assert latest_version(t) == v


def test_describe_table_summarizes_everything(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import (
        add_check_constraint,
        add_unique_constraint,
        describe_table,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k long, v double"
        ),
        t,
        layout_by=["k"],
        layout_files=2,
        bloom_cols=["k"],
    )
    add_unique_constraint(spark, t, "pk", ["k"])
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    d = describe_table(t)
    assert d["columns"] == {"k": "long", "v": "double"}
    assert d["layout"]["by"] == ["k"]
    assert d["unique"] == {"pk": ["k"]}
    assert d["constraints"] == {"v_nonneg": "v >= 0"}
    assert d["bloom_columns"] == ["k"]
    assert "k" in d["stats_columns"]  # layout implies stats
    assert d["num_files"] == 2 and d["size_bytes"] > 0
    assert d["retained_versions"] == d["version"] + 1
    expire_history(t, keep_last=1)
    assert describe_table(t)["retained_versions"] == 1
    with pytest.raises(FileNotFoundError):
        describe_table(str(tmp_path / "nope"))
