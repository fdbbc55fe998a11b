"""Incremental re-clustering (sources/versioned.recluster): only the
files that hurt pruning on the recorded layout keys are rewritten;
well-clustered files carry by reference. The liquid-clustering
maintenance shape — victim choice is metadata-only (stats-box volume
vs the ideal per-file share of the key-space)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    delete_where,
    files_for_read,
    latest_version,
    manifest_info,
    maybe_compact,
    read_snapshot,
    recluster,
    table_changes,
    write_snapshot,
)


def _rows(spark, t, **kw):
    return sorted((r.k, r.v) for r in read_snapshot(spark, t, **kw).collect())


def _mk_clustered(spark, t, n=20000, files=4):
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(n)], "k long, v string"
        ),
        t,
        layout_by=["k"],
        layout_files=files,
    )


def test_recluster_rewrites_only_the_wide_tail(spark, tmp_path):
    """A well-sized but UNclustered append (full key range) is the case
    size-based bin-packing can never repair: recluster folds exactly
    those files back into the curve and carries the clustered base by
    reference."""
    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t)
    base_files, _ = files_for_read(t)
    # two appends spanning the whole key range — unclustered by design
    for off in (0, 1):
        write_snapshot(
            spark.createDataFrame(
                [(i * 2 + off, "tail") for i in range(10000)],
                "k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    want = _rows(spark, t)
    v = recluster(spark, t)
    assert v == latest_version(t)
    info = manifest_info(t)
    assert info["mode"] == "compact"
    m = info.get("metrics", {})
    assert m.get("numRemovedFiles") == 2 and m.get("numAddedFiles") >= 1
    after, _ = files_for_read(t)
    for f in base_files:
        assert f in after  # clustered base carried BY REFERENCE
    assert _rows(spark, t) == want  # rows bit-identical
    # pruning restored: a narrow range read opens few files
    kept, total = files_for_read(t, skip_filter={"k": (100, 200)})
    assert total >= 6 and len(kept) <= 2


def test_recluster_noop_on_well_clustered_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t)
    assert recluster(spark, t) is None
    # and on a table with no recorded layout at all
    t2 = str(tmp_path / "flat")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        t2,
        stats_cols=["k"],
    )
    assert recluster(spark, t2) is None


def test_recluster_folds_small_files_in_the_same_commit(spark, tmp_path):
    """small_bytes folds the bin-pack victims into the ONE rewrite:
    a maintenance pass repairs layout and file size together."""
    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t)
    write_snapshot(  # wide append
        spark.createDataFrame(
            [(i * 3, "tail") for i in range(8000)], "k long, v string"
        ).coalesce(1),
        t,
        mode="append",
    )
    write_snapshot(  # tiny append (narrow span, small file)
        spark.createDataFrame([(7, "tiny")], "k long, v string"),
        t,
        mode="append",
    )
    files0, _ = files_for_read(t)
    sizes = {f: os.path.getsize(os.path.join(t, f)) for f in files0}
    tiny = min(sizes, key=sizes.get)
    want = _rows(spark, t)
    v0 = latest_version(t)
    v = recluster(spark, t, small_bytes=sizes[tiny] + 1)
    assert v == v0 + 1  # ONE commit
    after, _ = files_for_read(t)
    assert tiny not in after  # the small file folded too
    assert _rows(spark, t) == want


def test_recluster_through_deletion_vectors(spark, tmp_path):
    """A DV-shadowed victim rewrites to its survivors; the vectors on
    rewritten files are gone afterwards."""
    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t, n=5000)
    for off in (1, 3):
        write_snapshot(
            spark.createDataFrame(
                [(i * 4 + off, "tail") for i in range(3000)],
                "k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    delete_where(
        spark,
        t,
        (F.col("v") == "tail") & (F.col("k") % 10 == 1),
        strategy="dv",
    )
    want = _rows(spark, t)
    assert recluster(spark, t) is not None
    assert _rows(spark, t) == want
    # the rewrite materialized survivors: no vector shadows any
    # rewritten file (wide tail files were the only shadowed ones)
    import wrtd_etl_spark.sources.versioned as V

    root = V._read_manifest_root(t, latest_version(t))
    assert all(
        (s.get("dv_rows", 0) if V._is_seg_head(s) else len(s.get("dvs", {})))
        == 0
        for s in V._segments(root)
    )


def test_recluster_is_carry_only_for_cdc(spark, tmp_path):
    """On a row-tracked table the keyed CDC diff cancels a recluster to
    an EMPTY logical delta — subscribers pay nothing for maintenance."""
    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t, n=5000)
    for off in (0, 2):
        write_snapshot(
            spark.createDataFrame(
                [(i * 4 + off, "tail") for i in range(2000)],
                "k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    v_before = latest_version(t)
    v = recluster(spark, t)
    assert v is not None
    delta = table_changes(spark, t, v_before + 1, v)
    assert delta.count() == 0


def test_maybe_compact_routes_clustered_tables_to_recluster(
    spark, tmp_path, monkeypatch
):
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t, n=4000)
    write_snapshot(
        spark.createDataFrame(
            [(i * 2, "tail") for i in range(4000)], "k long, v string"
        ).coalesce(1),
        t,
        mode="append",
    )
    called = {}
    real = V.recluster

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.setattr(V, "recluster", spy)
    v = maybe_compact(spark, t, max_files=1, small_bytes=1 << 20)
    assert called.get("yes") and v is not None


def test_recluster_victim_scan_is_two_tier(spark, tmp_path, monkeypatch):
    """Victim SCREENING is root-only: narrow sharded segments (their
    coarse summary box already under the victim threshold) never
    resolve their detail sidecar and their heads carry byte-for-byte
    into the new manifest — the reorg_purge discipline. Only the
    possible-victim segments (wide summary box) open detail."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t)  # 1 segment, 4 narrow files, WIDE box
    # six narrow disjoint appends: each segment's box spans 1/20th
    for i in range(6):
        lo = i * 1000
        write_snapshot(
            spark.createDataFrame(
                [(k, "nar") for k in range(lo, lo + 1000)],
                "k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    # two wide appends: full-range boxes, the victims
    for off in (0, 1):
        write_snapshot(
            spark.createDataFrame(
                [(k * 2 + off, "tail") for k in range(10000)],
                "k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    root_before = V._read_manifest_root(t, latest_version(t))
    narrow_refs = {
        s["ref"]
        for s in V._segments(root_before)
        if V._is_seg_head(s) and s["n_files"] == 1 and s.get("bytes", 0)
        and (lambda mm: mm and mm[1] - mm[0] < 2000)(
            (s.get("summary") or {}).get("k")
        )
    }
    assert len(narrow_refs) == 6
    want = _rows(spark, t)
    real = V._resolve_seg
    opened = []

    def counting(table, seg):
        if V._is_seg_head(seg):
            opened.append(seg["ref"])
        return real(table, seg)

    monkeypatch.setattr(V, "_resolve_seg", counting)
    v = recluster(spark, t)
    assert v is not None
    # no narrow segment's sidecar ever opened during the whole rewrite
    assert not (set(opened) & narrow_refs), opened
    # and their heads carried by reference into the new root
    root_after = V._read_manifest_root(t, v)
    after_refs = {
        s["ref"] for s in V._segments(root_after) if V._is_seg_head(s)
    }
    assert narrow_refs <= after_refs
    monkeypatch.setattr(V, "_resolve_seg", real)
    assert _rows(spark, t) == want


def test_recluster_follows_renamed_layout_key(spark, tmp_path):
    """A renamed clustering key resolves through the alias map: old
    segments' stats (physical names) still screen, so the clustered
    base is NOT misread as stat-less and carries by reference."""
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20000)], "k long, v string"
        ),
        t,
        layout_by=["k"],
        layout_files=4,
    )
    base_files, _ = files_for_read(t)
    # rename the layout key, then two wide unclustered appends
    write_snapshot(
        spark.createDataFrame([(90000, "r")], "kk long, v string"),
        t,
        mode="append",
        renames={"k": "kk"},
    )
    for off in (0, 1):
        write_snapshot(
            spark.createDataFrame(
                [(i * 2 + off, "tail") for i in range(10000)],
                "kk long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    want = sorted(
        (r.kk, r.v) for r in read_snapshot(spark, t).collect()
    )
    v = recluster(spark, t)
    assert v is not None
    after, _ = files_for_read(t)
    for f in base_files:
        assert f in after  # pre-rename clustered base carried by ref
    assert (
        sorted((r.kk, r.v) for r in read_snapshot(spark, t).collect())
        == want
    )


def test_recluster_on_evolved_schema(spark, tmp_path):
    """Victims spanning a schema evolution rewrite NULL-filled to the
    table schema; rows survive exactly."""
    from wrtd_etl_spark.sources.versioned import alter_add_column

    t = str(tmp_path / "tbl")
    _mk_clustered(spark, t, n=8000)
    alter_add_column(spark, t, "w", "long")
    for off in (0, 1):
        write_snapshot(
            spark.createDataFrame(
                [(i * 2 + off, "tail", i) for i in range(4000)],
                "k long, v string, w long",
            ).coalesce(1),
            t,
            mode="append",
        )
    want = sorted(
        (r.k, r.v, r.w) for r in read_snapshot(spark, t).collect()
    )
    v = recluster(spark, t)
    assert v is not None
    got = sorted((r.k, r.v, r.w) for r in read_snapshot(spark, t).collect())
    assert got == want


def test_recluster_two_key_volume_rule(spark, tmp_path):
    """Multi-key layouts use the stats-box VOLUME (product of
    normalized spans): a z-clustered 2-key base file is wide-ish in
    EACH dimension (~n^-1/2 per side) but small in volume, so it
    carries; a full-range append is volume ~1 and rewrites."""
    t = str(tmp_path / "tbl")
    rows = [(i % 100, (i * 37) % 100, i) for i in range(20000)]
    write_snapshot(
        spark.createDataFrame(rows, "a long, b long, v long"),
        t,
        layout_by=["a", "b"],
        layout_files=9,
    )
    base_files, _ = files_for_read(t)
    assert recluster(spark, t) is None  # clustered base: no victims
    for off in (0, 1):  # two full-plane appends
        write_snapshot(
            spark.createDataFrame(
                [((i * 2 + off) % 100, (i * 53 + off) % 100, i)
                 for i in range(5000)],
                "a long, b long, v long",
            ).coalesce(1),
            t,
            mode="append",
        )
    appended = [
        f for f in files_for_read(t)[0] if f not in set(base_files)
    ]
    want = sorted(
        (r.a, r.b, r.v) for r in read_snapshot(spark, t).collect()
    )
    v = recluster(spark, t)
    assert v is not None
    after, _ = files_for_read(t)
    # both full-plane appends rewrote; MOST base files carried (a
    # z-partition straddling a quadrant boundary legitimately has a
    # wide box in both dims — the curve's honest jump — and may rewrite)
    assert not (set(appended) & set(after))
    carried = sum(f in after for f in base_files)
    assert carried >= len(base_files) * 2 // 3, (carried, len(base_files))
    assert (
        sorted((r.a, r.b, r.v) for r in read_snapshot(spark, t).collect())
        == want
    )


def test_recluster_survives_degenerate_layout_dimension(spark, tmp_path):
    """A table-wide CONSTANT layout key must not poison the volume
    product: width detection keeps working on the other, live
    dimension (the advisor's zero-multiply regression — every volume
    collapsed to 0 and maintenance silently became a no-op)."""
    t = str(tmp_path / "tbl")
    rows = [(1, i, f"v{i}") for i in range(20000)]  # `a` constant
    write_snapshot(
        spark.createDataFrame(rows, "a long, k long, v string"),
        t,
        layout_by=["a", "k"],
        layout_files=4,
    )
    base_files, _ = files_for_read(t)
    assert recluster(spark, t) is None  # clustered in the live dim
    for off in (0, 1):  # two full-range appends in the live dim
        write_snapshot(
            spark.createDataFrame(
                [(1, i * 2 + off, "tail") for i in range(8000)],
                "a long, k long, v string",
            ).coalesce(1),
            t,
            mode="append",
        )
    want = sorted(
        (r.a, r.k, r.v) for r in read_snapshot(spark, t).collect()
    )
    v = recluster(spark, t)
    assert v is not None, "degenerate dim disabled wide detection"
    info = manifest_info(t)
    assert info.get("metrics", {}).get("numRemovedFiles") == 2
    after, _ = files_for_read(t)
    for f in base_files:
        assert f in after  # clustered base still carries by reference
    assert (
        sorted((r.a, r.k, r.v) for r in read_snapshot(spark, t).collect())
        == want
    )


def test_recluster_all_degenerate_still_folds_small_files(spark, tmp_path):
    """When NO layout key discriminates (all constant), width screening
    is meaningless — but small-file bin-packing must stay alive, since
    maybe_compact routes clustered tables here."""
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(7, i) for i in range(5000)], "k long, v long"
        ).coalesce(2),
        t,
        layout_by=["k"],
    )
    for i in range(3):  # three tiny constant-key appends
        write_snapshot(
            spark.createDataFrame([(7, 10000 + i)], "k long, v long"),
            t,
            mode="append",
        )
    files0, _ = files_for_read(t)
    sizes = {f: os.path.getsize(os.path.join(t, f)) for f in files0}
    tiny = sorted(sizes, key=sizes.get)[:3]
    want = _rows(spark, t)
    v = recluster(spark, t, small_bytes=max(sizes[f] for f in tiny) + 1)
    assert v is not None, "small-file folding died with the volume rule"
    after, _ = files_for_read(t)
    assert not (set(tiny) & set(after))
    assert _rows(spark, t) == want
