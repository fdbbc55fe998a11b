"""Zero-copy table clone (sources/versioned.clone_table): hardlinked
data files, fresh history, carried table properties, vacuum-safe."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    add_unique_constraint,
    clone_table,
    latest_version,
    manifest_info,
    read_snapshot,
    unique_constraints,
    vacuum,
    write_snapshot,
)


def _rows(spark, t, **kw):
    return sorted((r.k, r.v) for r in read_snapshot(spark, t, **kw).collect())


def test_clone_reads_equal_and_histories_diverge(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k long, v string"),
        src,
        stats_cols=["k"],
    )
    write_snapshot(
        spark.createDataFrame([(100, "x")], "k long, v string"),
        src,
        mode="append",
    )
    clone_table(src, dst)
    assert latest_version(dst) == 0
    assert _rows(spark, dst) == _rows(spark, src)
    assert manifest_info(dst)["extra"]["cloned_from"] == src
    # divergence: writes on either side are invisible to the other
    write_snapshot(
        spark.createDataFrame([(200, "clone-only")], "k long, v string"),
        dst,
        mode="append",
    )
    write_snapshot(
        spark.createDataFrame([(300, "src-only")], "k long, v string"),
        src,
        mode="append",
    )
    assert (200, "clone-only") in _rows(spark, dst)
    assert (200, "clone-only") not in _rows(spark, src)
    assert (300, "src-only") not in _rows(spark, dst)


def test_clone_pinned_version_and_existing_target_refused(spark, tmp_path):
    src = str(tmp_path / "src")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), src
    )
    write_snapshot(
        spark.createDataFrame([(2, "b")], "k long, v string"),
        src,
        mode="append",
    )
    d0 = str(tmp_path / "d0")
    clone_table(src, d0, version=0)
    assert _rows(spark, d0) == [(1, "a")]  # the PAST state, not latest
    with pytest.raises(ValueError, match="already exists"):
        clone_table(src, d0)


def test_clone_survives_source_vacuum(spark, tmp_path):
    """The hardlink keeps the bytes alive after the source overwrites
    and vacuums away every file the clone references."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_snapshot(
        spark.createDataFrame([(1, "keep")], "k long, v string"), src
    )
    clone_table(src, dst)
    write_snapshot(
        spark.createDataFrame([(9, "new")], "k long, v string"), src
    )  # overwrite: old files now unreferenced in src
    removed = vacuum(src, keep_last=1, tmp_age_s=0.0)
    assert removed  # the clone's source files are gone from src
    assert _rows(spark, dst) == [(1, "keep")]


def test_clone_carries_properties(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k long, v string"
        ),
        src,
        layout_by=["k"],
        layout_files=2,
        bloom_cols=["k"],
    )
    add_unique_constraint(spark, src, "pk", ["k"])
    clone_table(src, dst)
    assert unique_constraints(dst) == {"pk": ["k"]}
    from wrtd_etl_spark.sources.versioned import UniqueConstraintViolation

    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame([(3, "dup")], "k long, v string"),
            dst,
            mode="append",
        )
    # layout carried: the clone's manifest records the Z-order spec
    assert manifest_info(dst)["layout"]["by"] == ["k"]


def test_clone_shares_inodes_not_bytes(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), src
    )
    clone_table(src, dst)
    from wrtd_etl_spark.sources.versioned import files_for_read

    rel, _ = files_for_read(dst)
    assert rel
    for f in rel:
        assert os.stat(os.path.join(src, f)).st_ino == os.stat(
            os.path.join(dst, f)
        ).st_ino
