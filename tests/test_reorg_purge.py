"""Surgical REORG PURGE (r8): materializing deletion vectors rewrites
ONLY the DV-shadowed files — unshadowed files keep their inodes and
unshadowed segments keep their detail-sidecar refs byte-for-byte (the
``compact_small_files`` carry shape). The ``maybe_compact`` dv trigger
routes here instead of the full-table ``compact``; full ``compact``
behavior is unchanged.

Also pins the r8 ADVICE fixes:
* ``_seg_summary`` treats a stats-less file as opening every bound
  (summary keyed on the segment's REAL file count, not ``len(stats)``);
* rewrite-candidate segments never carry dv/stat/bloom entries for
  files they don't own (no stale-shadow after chained partial DV DML);
* a carried legacy layout with a string key warns + skips clustering
  in maintenance instead of raising (fresh declarations still raise).
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

import wrtd_etl_spark.sources.versioned as V
from wrtd_etl_spark.sources.versioned import (
    compact,
    delete_where,
    describe_table,
    maybe_compact,
    read_snapshot,
    reorg_purge,
    update_where,
    write_snapshot,
)


def _inodes(paths):
    return {p: os.stat(p).st_ino for p in paths}


def _seg_refs(t):
    """{ref: n_files} for every head in the latest root manifest."""
    root = V._read_manifest_root(t, V._read_pointer(t))
    return {
        s["ref"]: s["n_files"]
        for s in V._segments(root)
        if V._is_seg_head(s)
    }


def test_purge_rewrites_only_shadowed_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # segment 1: k in [0, 1000) over several files
    df1 = spark.createDataFrame(
        [(i, "a") for i in range(1000)], "k long, s string"
    ).repartition(4)
    write_snapshot(df1, t, stats_cols=["k"])
    # segment 2: k in [1000, 2000) — will stay unshadowed
    df2 = spark.createDataFrame(
        [(i, "b") for i in range(1000, 2000)], "k long, s string"
    ).repartition(3)
    write_snapshot(df2, t, mode="append", stats_cols=["k"])
    # vector a slice of segment 1 only
    delete_where(
        spark, t, F.col("k") < 120, prune={"k": (None, 119)}, strategy="dv"
    )
    assert describe_table(t)["dv_rows"] == 120
    refs_before = _seg_refs(t)
    files_before = sorted(glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    manifest = V._read_manifest(t, V._read_pointer(t))
    shadowed = {
        os.path.join(t, rel)
        for seg in V._segments(manifest)
        for rel in V._seg_dvs(seg)
    }
    assert shadowed  # sanity: the delete left vectors behind
    unshadowed = [p for p in files_before if p not in shadowed]
    ino_before = _inodes(unshadowed)

    v = reorg_purge(spark, t)
    assert v is not None
    assert describe_table(t)["dv_rows"] == 0
    got = sorted(r.k for r in read_snapshot(spark, t).collect())
    assert got == list(range(120, 2000))
    # every unshadowed data file survived IN PLACE (same inode) and is
    # still referenced by the new version
    assert _inodes(unshadowed) == ino_before
    cur_files = {
        os.path.join(t, rel)
        for rel in V._read_manifest(t, v)["files"]
    }
    assert set(unshadowed) <= cur_files
    # shadowed files are out of the current version (old version keeps
    # them for time travel)
    assert not (shadowed & cur_files)
    # the fully-unshadowed segment's detail sidecar carried BY REF
    refs_after = _seg_refs(t)
    carried = set(refs_before) & set(refs_after)
    assert carried, "expected at least one head to carry by reference"
    # time travel: pre-purge version still applies the vectors
    assert read_snapshot(spark, t, version=v - 1).count() == 1880


def test_purge_noop_and_maybe_compact_routing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(600)], "k long, g long"
    ).repartition(3)
    write_snapshot(df, t, stats_cols=["k"])
    assert reorg_purge(spark, t) is None  # no vectors: nothing to purge
    delete_where(
        spark, t, F.col("k") < 150, prune={"k": (None, 149)}, strategy="dv"
    )
    files_before = sorted(glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    manifest = V._read_manifest(t, V._read_pointer(t))
    shadowed = {
        os.path.join(t, rel)
        for seg in V._segments(manifest)
        for rel in V._seg_dvs(seg)
    }
    unshadowed = [p for p in files_before if p not in shadowed]
    ino_before = _inodes(unshadowed)
    # the dv trigger must route to the surgical purge, not full compact
    v = maybe_compact(spark, t, max_files=64, dv_rows_max=100)
    assert v is not None and describe_table(t)["dv_rows"] == 0
    assert read_snapshot(spark, t).count() == 450
    if unshadowed:
        assert _inodes(unshadowed) == ino_before
    # below both thresholds: no rewrite fires
    assert maybe_compact(spark, t, max_files=64, dv_rows_max=100) is None


def test_purge_covers_update_dv_and_repeat(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, 0) for i in range(400)], "k long, val long"
    ).repartition(2)
    write_snapshot(df, t, stats_cols=["k"])
    update_where(
        spark,
        t,
        F.col("k") < 50,
        {"val": F.lit(9)},
        prune={"k": (None, 49)},
        strategy="dv",
    )
    v = reorg_purge(spark, t)
    assert v is not None and describe_table(t)["dv_rows"] == 0
    rows = {r.k: r.val for r in read_snapshot(spark, t).collect()}
    assert len(rows) == 400
    assert all(v == 9 for k, v in rows.items() if k < 50)
    assert all(v == 0 for k, v in rows.items() if k >= 50)
    assert reorg_purge(spark, t) is None  # idempotent: vectors are gone


def test_seg_summary_statless_file_opens_bounds():
    stats = {"f1.parquet": {"k": [0, 10], "g": [5, 9]}}
    # one of two files has no stats at all: EVERY bound must open
    assert V._seg_summary(stats, 2) == {}
    # all files covered: bounds hold
    assert V._seg_summary(stats, 1) == {"k": [0, 10], "g": [5, 9]}
    two = {"f1.parquet": {"k": [0, 10]}, "f2.parquet": {"k": [20, 30]}}
    assert V._seg_summary(two, 2) == {"k": [0, 30]}
    assert V._seg_summary({}, 3) == {}


def test_statless_file_never_segment_pruned(spark, tmp_path):
    """A file whose stats entry is missing must survive head-level
    segment pruning (it always survives per-file pruning)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i,) for i in range(100)], "k long"
    ).coalesce(1)
    write_snapshot(df, t, stats_cols=["k"])
    # simulate a stats-less file in the same segment: strip the stats
    # entry from the detail sidecar and rebuild the head summary the
    # way _write_seg_detail would
    p = V._read_pointer(t)
    root = V._read_manifest_root(t, p)
    heads = [s for s in V._segments(root) if V._is_seg_head(s)]
    assert len(heads) == 1
    seg = V._resolve_seg(t, heads[0])
    seg = {k: v for k, v in seg.items() if k != "ref"}
    seg["stats"] = {}  # the lone file now has no stats
    new_head = V._write_seg_detail(t, seg)
    assert new_head["summary"] == {}  # open bounds
    root["segments"] = [new_head]
    with open(V._manifest_path(t, p), "w") as f:
        json.dump(root, f)
    # a skip_filter far outside the (now unrecorded) range must still
    # read the stats-less file
    got = read_snapshot(spark, t, skip_filter={"k": (1_000_000, None)})
    assert got.count() == 100


def test_chained_partial_dv_no_stale_entries(spark, tmp_path):
    """After chained pruned DV DML, every committed segment's dv (and
    stat/bloom) entries reference only files the segment owns."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(900)], "k long, g long"
    ).repartition(3)
    write_snapshot(df, t, stats_cols=["k"])
    delete_where(
        spark, t, F.col("k") < 60, prune={"k": (None, 59)}, strategy="dv"
    )
    delete_where(
        spark, t, F.col("k") >= 840, prune={"k": (840, None)}, strategy="dv"
    )
    delete_where(
        spark, t, F.col("k") < 90, prune={"k": (None, 89)}, strategy="dv"
    )
    update_where(
        spark,
        t,
        (F.col("k") >= 400) & (F.col("k") < 410),
        {"g": F.lit(7)},
        prune={"k": (400, 409)},
        strategy="dv",
    )
    m = V._read_manifest(t, V._read_pointer(t))
    for seg in V._segments(m):
        members = set(seg["files"])
        assert set(V._seg_dvs(seg)) <= members
        assert set(seg.get("stats", {})) <= members
        assert set(seg.get("blooms", {})) <= members
    got = sorted(r.k for r in read_snapshot(spark, t).collect())
    assert got == list(range(90, 840))
    assert read_snapshot(spark, t).filter("g = 7").count() == 10


def test_legacy_unclusterable_layout_warns_not_raises(spark, tmp_path):
    """Maintenance on a table whose RECORDED layout has a key type the
    curve cannot rank (binary — legacy / forged state) must warn and
    skip clustering — never fail the rewrite. Fresh declarations still
    raise. (String keys stopped being this case in r9: they cluster
    via the byte-prefix rank.)"""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, bytearray(f"s{i % 4}".encode())) for i in range(200)],
        "k long, s binary",
    ).repartition(2)
    write_snapshot(df, t, stats_cols=["k"], layout_by=["k"])
    # forge the legacy state: recorded layout points at the binary col
    p = V._read_pointer(t)
    root = V._read_manifest_root(t, p)
    root["layout"] = {"by": ["s"], "files": 2}
    with open(V._manifest_path(t, p), "w") as f:
        json.dump(root, f)
    with pytest.warns(UserWarning, match="non-clusterable"):
        v = compact(spark, t, target_files=1)
    assert read_snapshot(spark, t, version=v).count() == 200
    with pytest.warns(UserWarning, match="non-clusterable"):
        delete_where(spark, t, F.col("k") < 10, prune={"k": (None, 9)})
    assert read_snapshot(spark, t).count() == 190
    # a FRESH declaration of a binary layout still refuses loudly
    t2 = str(tmp_path / "t2")
    with pytest.raises(TypeError, match="unsupported type"):
        write_snapshot(df, t2, layout_by=["s"])
