"""Row tracking / row lineage (r9 flagship, VERDICT r8 ask #1) — the
Delta-style stable row id that makes CDC rewrite-exact.

Mechanics pinned here:
* every new-data commit mints per-file metadata bases (``row_base`` in
  the segment head + ``[offset, n]`` per file in the immutable detail)
  — ids are PURE METADATA on the append path, zero data bytes;
* rewrites (compact / reorg_purge / CoW delete / CoW update / CoW
  merge) MATERIALIZE the ids of carried rows as a hidden ``__row_id``
  column, so the id survives arbitrary file reshuffling; the column
  never leaks into any reader surface;
* ``table_changes`` over a range whose rewrites preserved lineage runs
  the KEYED row-id diff over only the CHANGED segments: a compaction
  folds to an EMPTY delta, a partial rewrite reads only the touched
  segments (input-files assertion — no full-snapshot shuffle), and the
  fold of the emitted changes always reproduces the destination
  snapshot;
* index refreshers no longer rebuild across maintenance compaction:
  an append→compact→append range folds as exactly its appended rows
  (`upsert_fold` / append-fold), pinned for both the ANN store and the
  text index;
* marks are monotone and race-safe: concurrent appends mint disjoint
  dense bases; rollback/clone carry the HIGHEST mark.
"""

import threading

import pytest
from pyspark.sql import functions as F

import wrtd_etl_spark.sources.versioned as V
from wrtd_etl_spark.sources.versioned import (
    ROW_ID_COL,
    clone_table,
    compact,
    delete_where,
    merge_into,
    read_snapshot,
    reorg_purge,
    rollback,
    table_changes,
    update_where,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k long, v long"
    )


def _ids(spark, t, version=None):
    return {
        r.k: r._row_id
        for r in read_snapshot(
            spark, t, version=version, with_row_ids=True
        ).collect()
    }


def _fold(rows, base):
    out = dict(base)
    for k, v, ct in sorted(rows, key=lambda x: x[2] == "insert"):
        if ct == "delete":
            assert out.pop(k) == v, (k, v)
        else:
            out[k] = v
    return out


def test_mint_read_and_stability_through_rewrites(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 100).repartition(3), t, stats_cols=["k"])
    write_snapshot(_df(spark, 100, 150), t, mode="append", stats_cols=["k"])
    assert V._read_manifest_root(t, 1)["row_high"] == 150
    ids = _ids(spark, t)
    assert sorted(ids.values()) == list(range(150))  # dense mint
    compact(spark, t)
    assert _ids(spark, t) == ids  # compaction preserves every id
    # the materialized column never leaks
    assert read_snapshot(spark, t).columns == ["k", "v"]
    delete_where(spark, t, F.col("k") < 10, prune={"k": (None, 9)})
    ids2 = _ids(spark, t)
    assert all(ids2[k] == ids[k] for k in ids2) and len(ids2) == 140
    update_where(spark, t, F.col("k") == 50, {"v": F.lit(9)}, prune={"k": (50, 50)})
    assert _ids(spark, t)[50] == ids[50]  # update keeps identity
    merge_into(
        spark, t, spark.createDataFrame([(60, 6), (900, 9)], "k long, v long"),
        keys=["k"],
    )
    ids3 = _ids(spark, t)
    assert ids3[60] == ids[60]  # matched row keeps its id
    assert ids3[900] >= 150  # insert minted past the mark
    assert len(set(ids3.values())) == len(ids3)  # globally unique
    # the merge's mixed files (carried ids + NULL-id inserts riding the
    # same write) register a base spanning their FULL row count, so the
    # mark advances by the file span — id-space gaps, never collisions
    assert V._read_manifest_root(t, V._read_pointer(t))["row_high"] >= 151


def test_compact_range_is_empty_delta(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 200).repartition(4), t, stats_cols=["k"])
    write_snapshot(_df(spark, 200, 260), t, mode="append", stats_cols=["k"])
    v_pre = V._read_pointer(t)
    compact(spark, t)
    ch = table_changes(spark, t, v_pre, v_pre + 1)
    assert ch.count() == 0  # carried rows cancel BY ID — no churn


def test_keyed_diff_fold_reproduces_snapshot_across_lineage(
    spark, tmp_path
):
    """append → delete_dv → reorg_purge → CoW merge → CoW update: the
    emitted changes fold exactly onto the destination snapshot, and
    update/merge edits surface as delete+insert pairs."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 100).repartition(2), t, stats_cols=["k"])
    write_snapshot(_df(spark, 100, 140), t, mode="append", stats_cols=["k"])
    delete_where(
        spark, t, F.col("k").isin(3, 4), strategy="dv", prune={"k": (3, 4)}
    )
    reorg_purge(spark, t)
    merge_into(
        spark, t,
        spark.createDataFrame([(7, 777), (500, 5)], "k long, v long"),
        keys=["k"],
    )
    update_where(spark, t, F.col("k") == 120, {"v": F.lit(0)}, prune={"k": (120, 120)})
    to_v = V._read_pointer(t)
    for from_v in (0, 1, 2, 3):
        rows = [
            (r.k, r.v, r._change_type)
            for r in table_changes(spark, t, from_v, to_v).collect()
        ]
        base = {
            r.k: r.v
            for r in read_snapshot(spark, t, version=from_v).collect()
        }
        assert _fold(rows, base) == {
            r.k: r.v for r in read_snapshot(spark, t, version=to_v).collect()
        }
    # the update emitted a paired delete+insert for the SAME key
    pair = [
        (r.v, r._change_type)
        for r in table_changes(spark, t, to_v - 1, to_v).collect()
        if r.k == 120
    ]
    assert sorted(pair) == [(0, "insert"), (1200, "delete")]


def test_partial_rewrite_diff_reads_only_touched_segments(spark, tmp_path):
    """The input-files assertion VERDICT asked for: a merge that prunes
    to ONE of two segments diffs without reading the other segment —
    no full-snapshot read, no exceptAll."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 100).coalesce(1), t, stats_cols=["k"])
    write_snapshot(
        _df(spark, 1000, 1100).coalesce(1), t, mode="append",
        stats_cols=["k"],
    )
    seg_b_files = {
        f
        for s in [V._resolve_seg(t, V._segments(V._read_manifest_root(t, 1))[1])]
        for f in s["files"]
    }
    v_pre = V._read_pointer(t)
    merge_into(
        spark, t,
        spark.createDataFrame([(5, 55), (7, 77)], "k long, v long"),
        keys=["k"],
    )
    ch = table_changes(spark, t, v_pre, v_pre + 1)
    read = {f.split("/")[-1] for f in ch.inputFiles()}
    assert not read & {f.split("/")[-1] for f in seg_b_files}
    assert sorted((r.k, r.v, r._change_type) for r in ch.collect()) == [
        (5, 50, "delete"),
        (5, 55, "insert"),
        (7, 70, "delete"),
        (7, 77, "insert"),
    ]


def test_untracked_segments_fall_back_to_exceptall(spark, tmp_path):
    """A table with pre-tracking segments keeps the honest exceptAll
    diff (value-canceling) — the keyed proof refuses, never guesses."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 50).coalesce(1), t, stats_cols=["k"])
    # forge a pre-r9 segment: strip lineage from the detail sidecar
    import json
    import os

    root = V._read_manifest_root(t, 0)
    head = V._segments(root)[0]
    p = os.path.join(t, "_manifests", head["ref"])
    d = json.load(open(p))
    d.pop("rows", None)
    d.pop("rid", None)
    with open(p, "w") as f:
        json.dump(d, f)
    write_snapshot(_df(spark, 50, 60), t, mode="append", stats_cols=["k"])
    compact(spark, t)  # untracked seg in scope → compact stays untracked
    with pytest.raises(ValueError, match="row lineage"):
        read_snapshot(spark, t, version=0, with_row_ids=True)
    ch = table_changes(spark, t, 0, 2)
    rows = [(r.k, r.v, r._change_type) for r in ch.collect()]
    # exceptAll semantics: appended rows only, compact churn cancels
    assert sorted(rows) == [(k, k * 10, "insert") for k in range(50, 60)]


def test_concurrent_appends_mint_disjoint_dense_bases(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), t)
    errs = []

    def w(lo, hi):
        try:
            write_snapshot(_df(spark, lo, hi), t, mode="append")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [
        threading.Thread(target=w, args=(100, 140)),
        threading.Thread(target=w, args=(200, 225)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    ids = _ids(spark, t)
    assert sorted(ids.values()) == list(range(75))  # dense, no overlap
    assert V._read_manifest_root(t, V._read_pointer(t))["row_high"] == 75


def test_marks_survive_rollback_and_clone(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 20), t)
    write_snapshot(_df(spark, 20, 30), t, mode="append")
    rollback(t, 0)
    m = V._read_manifest_root(t, V._read_pointer(t))
    assert m["row_high"] == 30  # the mark never decreases
    write_snapshot(_df(spark, 90, 95), t, mode="append")
    ids = _ids(spark, t)
    assert sorted(ids.values()) == list(range(20)) + list(range(30, 35))
    c = str(tmp_path / "clone")
    clone_table(t, c)
    assert V._read_manifest_root(c, 0)["row_high"] == 35
    assert _ids(spark, c) == ids


def test_ann_refresher_upserts_across_compaction(spark, tmp_path):
    """append → compact → append used to force an index REBUILD
    (delta_files None); the keyed diff folds it as exactly the appended
    vectors."""
    import numpy as np

    from wrtd_etl_spark.similarity.index_store import (
        refresh_ann_index,
        sq8_query,
        write_ann_index_from,
    )

    rng = np.random.default_rng(7)

    def vecs(spark, lo, hi):
        return spark.createDataFrame(
            [
                (i, [float(x) for x in rng.normal(size=8)])
                for i in range(lo, hi)
            ],
            "id long, vec array<float>",
        )

    corpus = str(tmp_path / "corpus")
    write_snapshot(vecs(spark, 0, 60).coalesce(1), corpus)
    idx = str(tmp_path / "idx")
    write_ann_index_from(spark, corpus, idx, "sq8", "vec", "id")
    write_snapshot(vecs(spark, 60, 80).coalesce(1), corpus, mode="append")
    compact(spark, corpus)
    write_snapshot(vecs(spark, 80, 90).coalesce(1), corpus, mode="append")
    v, action = refresh_ann_index(spark, corpus, idx)
    assert action == "upsert_fold"
    got = {r.id for r in read_snapshot(spark, idx).collect()}
    assert got == set(range(90))
    # and search still works over the folded index
    assert sq8_query(spark, idx, vecs(spark, 0, 1), k=3).count() > 0


def test_text_index_append_folds_across_compaction(spark, tmp_path):
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )

    docs = str(tmp_path / "docs")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"alpha beta doc{i}") for i in range(20)],
            "doc_id long, text string",
        ).coalesce(1),
        docs,
    )
    idx = str(tmp_path / "tidx")
    build_text_index_from(spark, docs, idx)
    write_snapshot(
        spark.createDataFrame(
            [(i, f"gamma delta doc{i}") for i in range(20, 30)],
            "doc_id long, text string",
        ).coalesce(1),
        docs,
        mode="append",
    )
    compact(spark, docs)
    n_before = read_snapshot(spark, idx).count()
    refresh_text_index(spark, docs, idx)
    folded = read_snapshot(spark, idx)
    assert folded.filter(F.col("token") == "gamma").count() == 10
    assert folded.count() > n_before
    # idempotent: a second refresh is a pure stamp
    v2 = refresh_text_index(spark, docs, idx)
    assert read_snapshot(spark, idx).count() == folded.count()


def test_datasource_and_sql_surface_row_ids(spark, tmp_path):
    """`read_versioned(with_row_ids=True)` (Arrow executors) equals
    `read_snapshot(with_row_ids=True)` (JVM path) row-for-row across a
    lineage with minted, materialized, AND mixed files — and the SQL
    view exposes `_row_id` to plain spark.sql."""
    from wrtd_etl_spark.sources.versioned_table import (
        read_versioned,
        register_versioned_view,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 80).repartition(2), t, stats_cols=["k"])
    delete_where(spark, t, F.col("k").isin(5), strategy="dv", prune={"k": (5, 5)})
    compact(spark, t)  # materialized-id files
    merge_into(  # mixed file: carried ids + NULL-id insert
        spark, t,
        spark.createDataFrame([(7, 77), (900, 9)], "k long, v long"),
        keys=["k"],
    )
    jvm = {
        (r.k, r.v, r._row_id)
        for r in read_snapshot(spark, t, with_row_ids=True).collect()
    }
    arrow = {
        (r.k, r.v, r._row_id)
        for r in read_versioned(spark, t, with_row_ids=True).collect()
    }
    assert arrow == jvm and len(jvm) == 80
    # SQL surface
    register_versioned_view(spark, "rt_view", t, with_row_ids=True)
    got = {
        (r.k, r._row_id)
        for r in spark.sql(
            "SELECT k, _row_id FROM rt_view WHERE k IN (7, 900)"
        ).collect()
    }
    want = {(k, rid) for k, v, rid in jvm if k in (7, 900)}
    assert got == want
    # plain reads stay clean
    assert read_versioned(spark, t).columns == ["k", "v"]


def test_datasource_row_ids_refuse_untracked(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    import json
    import os

    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10).coalesce(1), t)
    root = V._read_manifest_root(t, 0)
    p = os.path.join(t, "_manifests", V._segments(root)[0]["ref"])
    d = json.load(open(p))
    d.pop("rows", None)
    with open(p, "w") as f:
        json.dump(d, f)
    with pytest.raises(Exception, match="row lineage"):
        read_versioned(spark, t, with_row_ids=True).collect()


def test_row_tracking_edge_cases(spark, tmp_path):
    """Empty-table merge, zero-row commits, ALTER inside a diff range —
    the lineage machinery degrades cleanly at every edge."""
    from wrtd_etl_spark.sources.versioned import (
        alter_add_column,
        alter_drop_column,
    )

    # merge into an EMPTY tracked table: no candidates → inserts mint
    t = str(tmp_path / "empty")
    write_snapshot(_df(spark, 0, 0), t)
    merge_into(spark, t, _df(spark, 0, 5), keys=["k"])
    assert sorted(_ids(spark, t).values()) == list(range(5))
    # a props-style empty append advances nothing and diffs empty
    t2 = str(tmp_path / "tbl2")
    write_snapshot(_df(spark, 0, 20).coalesce(1), t2, stats_cols=["k"])
    write_snapshot(_df(spark, 0, 0), t2, mode="append")
    assert V._read_manifest_root(t2, 1)["row_high"] == 20
    assert table_changes(spark, t2, 0, 1).count() == 0
    # ALTER inside the diff range: keyed diff still folds
    alter_add_column(spark, t2, "tag", "string")
    write_snapshot(
        spark.createDataFrame([(100, 1, "x")], "k long, v long, tag string"),
        t2,
        mode="append",
    )
    compact(spark, t2)
    alter_drop_column(t2, "tag")
    rows = [
        (r.k, r._change_type)
        for r in table_changes(spark, t2, 0).collect()
    ]
    # the added-then-dropped column nets out; only the append surfaces
    ins = [k for k, ct in rows if ct == "insert"]
    dels = [k for k, ct in rows if ct == "delete"]
    assert ins == [100] and dels == []
    # ids still dense + stable through the ALTER lineage
    assert sorted(_ids(spark, t2).values()) == list(range(21))


def _mdf(spark, lo, hi, tag="a"):
    return spark.createDataFrame(
        [(i, {"t": tag, "i": str(i)}, [{"n": str(i % 3)}]) for i in range(lo, hi)],
        "k long, props map<string,string>, tags array<map<string,string>>",
    )


def test_keyed_diff_canonicalizes_map_columns(spark, tmp_path):
    """Map-typed columns (the engine's own semi-structured `props`
    idiom) no longer force the exceptAll fallback — which Spark cannot
    even run over maps (set ops are undefined on MapType). The keyed
    diff compares sorted entry arrays, recursively through nested
    maps, so a compaction folds EMPTY and DML ranges emit exact
    deltas carrying the ORIGINAL map values."""
    t = str(tmp_path / "tbl")
    write_snapshot(_mdf(spark, 0, 80).repartition(2), t, stats_cols=["k"])
    write_snapshot(_mdf(spark, 80, 100), t, mode="append", stats_cols=["k"])
    v_pre = V._read_pointer(t)
    compact(spark, t)
    ch = table_changes(spark, t, v_pre, v_pre + 1)
    assert ch.count() == 0  # carried map rows cancel BY ID

    # dv delete + CoW update: exact delta, original map values emitted
    delete_where(spark, t, F.col("k") == 5, strategy="dv", prune={"k": (5, 5)})
    update_where(
        spark, t, F.col("k") == 7,
        {"props": F.create_map(F.lit("t"), F.lit("B"))},
        prune={"k": (7, 7)},
    )
    rows = [
        (r.k, dict(r.props), r._change_type)
        for r in table_changes(spark, t, v_pre + 1, V._read_pointer(t)).collect()
    ]
    assert sorted(rows, key=str) == sorted(
        [
            (5, {"t": "a", "i": "5"}, "delete"),
            (7, {"t": "a", "i": "7"}, "delete"),
            (7, {"t": "B"}, "insert"),
        ],
        key=str,
    )


def test_keyed_diff_map_key_order_is_canonical(spark, tmp_path):
    """Two physically different key orders of the SAME map must cancel
    as carried — entry order is unspecified in Spark, so only the
    canonicalized comparison keeps a rewrite's churn out of the CDC."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, {"x": "1", "y": "2"}), (2, {"y": "2", "x": "1"})],
        "k long, props map<string,string>",
    )
    write_snapshot(df.coalesce(1), t, stats_cols=["k"])
    write_snapshot(
        spark.createDataFrame([(3, {"z": "3"})], "k long, props map<string,string>"),
        t, mode="append", stats_cols=["k"],
    )
    v_pre = V._read_pointer(t)
    compact(spark, t)
    assert table_changes(spark, t, v_pre, v_pre + 1).count() == 0


def test_keyed_map_diff_folds_and_reads_only_touched_segments(
    spark, tmp_path
):
    """Fold ≡ snapshot over an append→update→compact lineage on a
    map-typed table, plus the input-files proof: a pruned CoW update's
    diff never reads the untouched segment."""
    t = str(tmp_path / "tbl")
    write_snapshot(_mdf(spark, 0, 60).coalesce(1), t, stats_cols=["k"])
    write_snapshot(
        _mdf(spark, 1000, 1060).coalesce(1), t, mode="append",
        stats_cols=["k"],
    )
    seg_b_files = {
        f
        for s in [
            V._resolve_seg(t, V._segments(V._read_manifest_root(t, 1))[1])
        ]
        for f in s["files"]
    }
    v_pre = V._read_pointer(t)
    update_where(
        spark, t, F.col("k") == 5,
        {"props": F.create_map(F.lit("t"), F.lit("upd"))},
        prune={"k": (5, 5)},
    )
    ch = table_changes(spark, t, v_pre, v_pre + 1)
    read = {f.split("/")[-1] for f in ch.inputFiles()}
    assert not read & {f.split("/")[-1] for f in seg_b_files}
    compact(spark, t)
    to_v = V._read_pointer(t)
    # fold the whole range's changes onto the v_pre snapshot
    rows = [
        (r.k, dict(r.props), r._change_type)
        for r in table_changes(spark, t, v_pre, to_v).collect()
    ]
    base = {
        r.k: dict(r.props)
        for r in read_snapshot(spark, t, version=v_pre).collect()
    }
    for k, p, ct in sorted(rows, key=lambda x: x[2] == "insert"):
        if ct == "delete":
            assert base.pop(k) == p, (k, p)
        else:
            base[k] = p
    assert base == {
        r.k: dict(r.props)
        for r in read_snapshot(spark, t, version=to_v).collect()
    }


def test_map_table_overwrite_range_diffs_via_canonical_exceptall(
    spark, tmp_path
):
    """Ranges the keyed proof refuses (overwrite re-mints identity) used
    to CRASH on map-typed tables — Spark defines no set ops over maps.
    The fallback now diffs through the canonical sorted-entry image and
    restores real map values on the way out."""
    t = str(tmp_path / "tbl")
    write_snapshot(_mdf(spark, 0, 20), t)
    write_snapshot(_mdf(spark, 10, 25, tag="b"), t, mode="overwrite")
    rows = [
        (r.k, dict(r.props), r._change_type)
        for r in table_changes(spark, t, 0, 1).collect()
    ]
    dels = {k for k, _, ct in rows if ct == "delete"}
    ins = {k for k, _, ct in rows if ct == "insert"}
    assert dels == set(range(0, 20)) and ins == set(range(10, 25))
    got = next(p for k, p, ct in rows if ct == "insert" and k == 10)
    assert got == {"t": "b", "i": "10"}


def test_keyed_diff_null_struct_stays_null(spark, tmp_path):
    """ADVICE r10 (low): the canonical image of a struct-containing-map
    column must keep NULL structs NULL — the bare F.struct rebuild
    turned them into structs of NULL fields, so a NULL-struct ->
    struct-of-NULLs update diffed as no-change and emitted rows were
    distorted. Pinned: the update surfaces, and emitted values
    round-trip exactly."""
    schema = "k long, s struct<name:string, m:map<string,string>>"
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, None), (2, ("x", {"a": "1"}))], schema)
        .coalesce(1),
        t,
        stats_cols=["k"],
    )
    v0 = V._read_pointer(t)
    # carried rows (incl. the NULL struct) cancel across a compaction
    write_snapshot(
        spark.createDataFrame([(3, None)], schema), t, mode="append",
        stats_cols=["k"],
    )
    compact(spark, t)
    assert table_changes(spark, t, v0 + 1, V._read_pointer(t)).count() == 0
    # NULL-struct -> struct-of-NULLs IS a change and must surface
    v_pre = V._read_pointer(t)
    update_where(
        spark, t, F.col("k") == 1,
        {"s": F.struct(
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("map<string,string>").alias("m"),
        )},
        prune={"k": (1, 1)},
    )
    rows = {
        (r.k, None if r.s is None else tuple(r.s), r._change_type)
        for r in table_changes(spark, t, v_pre, V._read_pointer(t)).collect()
    }
    assert rows == {
        (1, None, "delete"),
        (1, (None, None), "insert"),
    }, rows
