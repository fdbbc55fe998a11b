"""Persisted inverted text index (operators/text_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.operators.text_index import (
    build_text_index,
    search_corpus,
    search_text_index,
)
from wrtd_etl_spark.sources.versioned import (
    files_for_read,
    read_snapshot,
    write_snapshot,
)

from .conftest import SF_SMOKE

_TERMS = ["merge", "scan", "vector"]


def _key(rows):
    return sorted((r.doc_id, r.n_terms_hit, r.score, r["rank"]) for r in rows)


def test_persisted_search_equals_corpus_search(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    t = str(tmp_path / "idx")
    v = build_text_index(docs, t)
    assert v == 0
    stored = search_text_index(spark, t, _TERMS, k=10)
    direct = search_corpus(docs, _TERMS, k=10)
    got = _key(stored.collect())
    assert got == _key(direct.collect())
    assert len(got) == 10
    # every hit matches at least one term and ranks are 1..10
    assert [r[3] for r in sorted(got, key=lambda x: x[3])] == list(range(1, 11))


def test_term_lookup_prunes_postings_files(spark, tmp_path):
    """Range-clustering by token + manifest stats must let a narrow term
    range skip most postings files."""
    docs = load_table(spark, SF_SMOKE, "documents")
    t = str(tmp_path / "idx")
    build_text_index(docs, t, n_files=8)
    kept, total = files_for_read(t, skip_filter={"token": ("scan", "scan")})
    assert total >= 6
    assert len(kept) <= max(1, total // 3)


def test_search_rejects_non_index_table(spark, tmp_path):
    t = str(tmp_path / "plain")
    write_snapshot(spark.range(3), t)
    with pytest.raises(ValueError, match="text index"):
        search_text_index(spark, t, ["x"])


def test_search_handles_absent_terms(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = search_corpus(docs, ["zzzabsent", "merge"], k=5).collect()
    assert len(got) == 5
    assert all(r.n_terms_hit == 1 for r in got)
    none = search_corpus(docs, ["zzzabsent"], k=5).collect()
    assert none == []


def test_refresh_folds_append_only_delta(spark, tmp_path):
    """Incremental maintenance: append docs -> refresh indexes ONLY the
    delta (old postings files untouched), search equals a from-scratch
    index at the new version; fresh -> no-op."""
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    rebuilt = str(tmp_path / "idx2")

    write_snapshot(docs.filter(F.col("doc_id") < 300), src)
    build_text_index_from(spark, src, idx)
    assert refresh_text_index(spark, src, idx) is None  # fresh

    write_snapshot(
        docs.filter(F.col("doc_id") >= 300), src, mode="append"
    )
    before, _ = files_for_read(idx)
    v = refresh_text_index(spark, src, idx)
    assert v == 1
    after, _ = files_for_read(idx)
    assert set(before) <= set(after)  # old postings untouched

    build_text_index_from(spark, src, rebuilt)
    got = search_text_index(spark, idx, _TERMS, k=10)
    ref = search_text_index(spark, rebuilt, _TERMS, k=10)
    assert _key(got.collect()) == _key(ref.collect())


def test_refresh_folds_deletes_as_retractions(spark, tmp_path, monkeypatch):
    """r9 VERDICT ask #4: a corpus delete no longer rebuilds the index.
    The keyed diff names the deleted docs; their postings merge-delete
    out via deletion vectors (token files physically carried), n_docs
    shrinks, and search equals a from-scratch index."""
    import wrtd_etl_spark.operators.text_index as TI
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import delete_where, manifest_info

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    rebuilt = str(tmp_path / "idx2")

    write_snapshot(docs, src)
    build_text_index_from(spark, src, idx)
    files_before, _ = files_for_read(idx)

    delete_where(spark, src, F.col("doc_id") < 100)

    def _no_rebuild(*a, **k):  # the fold must never fall back
        raise AssertionError("delete range triggered a rebuild")

    monkeypatch.setattr(TI, "build_text_index_from", _no_rebuild)
    refresh_text_index(spark, src, idx)
    monkeypatch.undo()

    files_after, _ = files_for_read(idx)
    assert set(files_before) <= set(files_after)  # DV retraction carries files

    build_text_index_from(spark, src, rebuilt)
    got = search_text_index(spark, idx, _TERMS, k=10).collect()
    ref = search_text_index(spark, rebuilt, _TERMS, k=10).collect()
    assert _key(got) == _key(ref)
    # no deleted doc may surface, and the idf denominator matches a rebuild
    assert all(r.doc_id >= 100 for r in got)
    assert (
        manifest_info(idx)["extra"]["n_docs"]
        == manifest_info(rebuilt)["extra"]["n_docs"]
    )


def test_refresh_folds_updates_as_retract_plus_append(
    spark, tmp_path, monkeypatch
):
    """A CoW update (delete-old + insert-new in the keyed diff) folds as
    retraction + re-append of just the touched docs; tf/df stay exact
    vs a rebuild."""
    import wrtd_etl_spark.operators.text_index as TI
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import manifest_info, update_where

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    rebuilt = str(tmp_path / "idx2")

    write_snapshot(docs, src)
    build_text_index_from(spark, src, idx)

    update_where(
        spark, src, F.col("doc_id") < 50,
        {"text": F.concat(F.col("text"), F.lit(" zzznewterm"))},
    )

    def _no_rebuild(*a, **k):
        raise AssertionError("update range triggered a rebuild")

    monkeypatch.setattr(TI, "build_text_index_from", _no_rebuild)
    refresh_text_index(spark, src, idx)
    monkeypatch.undo()

    build_text_index_from(spark, src, rebuilt)
    for terms in (_TERMS, ["zzznewterm"]):
        got = search_text_index(spark, idx, terms, k=10).collect()
        ref = search_text_index(spark, rebuilt, terms, k=10).collect()
        assert _key(got) == _key(ref)
    assert (
        manifest_info(idx)["extra"]["n_docs"]
        == manifest_info(rebuilt)["extra"]["n_docs"]
    )


def test_refresh_rebuilds_on_reingested_doc_id(spark, tmp_path):
    """An append-only delta that RE-INGESTS an existing doc_id cannot
    append-compose (df/tf would double-count) — refresh must detect it
    and rebuild, keeping search identical to a from-scratch index."""
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    rebuilt = str(tmp_path / "idx2")

    write_snapshot(docs.filter(F.col("doc_id") < 300), src)
    build_text_index_from(spark, src, idx)
    # re-ingest docs 0-49 (plus genuinely new ones)
    write_snapshot(docs.filter(F.col("doc_id") < 50), src, mode="append")
    refresh_text_index(spark, src, idx)

    build_text_index_from(spark, src, rebuilt)
    got = search_text_index(spark, idx, _TERMS, k=10)
    ref = search_text_index(spark, rebuilt, _TERMS, k=10)
    assert _key(got.collect()) == _key(ref.collect())


def test_search_empty_terms_returns_no_rows(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    t = str(tmp_path / "idx")
    build_text_index(docs, t)
    assert search_text_index(spark, t, [], k=5).collect() == []


def test_refresh_compact_only_range_is_stamp_bump(spark, tmp_path):
    """A corpus compaction changes nothing logically: refresh must NOT
    rebuild (the classification is manifest-driven — no snapshot diff),
    just bump the stamp so later appends still fold incrementally."""
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import (
        compact,
        history,
        manifest_info,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    write_snapshot(docs.filter(F.col("doc_id") < 200), src)
    write_snapshot(
        docs.filter(F.col("doc_id").between(200, 300)), src, mode="append"
    )
    build_text_index_from(spark, src, idx)
    n_before = read_snapshot(spark, idx).count()
    compact(spark, src, target_files=2)
    refresh_text_index(spark, src, idx)
    # stamp advanced, index content untouched (empty append, no rebuild)
    assert manifest_info(idx)["extra"]["source_version"] == 2
    assert history(idx)[0]["mode"] == "append"
    assert read_snapshot(spark, idx).count() == n_before
    # later appends fold incrementally from the new stamp
    write_snapshot(
        docs.filter(F.col("doc_id") > 300), src, mode="append"
    )
    refresh_text_index(spark, src, idx)
    assert history(idx)[0]["mode"] == "append"
    rebuilt = str(tmp_path / "idx2")
    build_text_index_from(spark, src, rebuilt)
    got = search_text_index(spark, idx, _TERMS, k=10)
    ref = search_text_index(spark, rebuilt, _TERMS, k=10)
    assert _key(got.collect()) == _key(ref.collect())


def test_refresh_maintains_index_dv_debt(spark, tmp_path, monkeypatch):
    """r11 (VERDICT r10 ask #3): retraction folds accrue deletion
    vectors on the POSTINGS table, and nothing used to purge them — a
    year of GDPR erasures left every search paying an ever-larger
    position anti-join. refresh_text_index now settles its own table's
    debt: past maintain_dv_rows shadowed rows a REORG PURGE fires
    (spied), search results stay identical to a from-scratch build,
    token-range pruning keeps its planted bound (purge never merges
    files), and the version stamp survives the maintenance commit."""
    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import delete_where, manifest_info

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    rebuilt = str(tmp_path / "idx2")
    write_snapshot(docs, src)
    build_text_index_from(spark, src, idx, n_files=8)

    purges = []
    real_purge = V.reorg_purge
    monkeypatch.setattr(
        V,
        "reorg_purge",
        lambda *a, **k: purges.append(a[1]) or real_purge(*a, **k),
    )
    for lo in (0, 40, 80):
        delete_where(
            spark, src,
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 40),
        )
        refresh_text_index(spark, src, idx, maintain_dv_rows=10)
    monkeypatch.undo()
    assert idx in purges, "DV purge never fired on the index table"
    # the purge actually settled the debt: no DV rows remain shadowed
    root = V._read_manifest_root(idx, V._read_pointer(idx))
    dv_rows = sum(
        (
            s.get("dv_rows", 0)
            if V._is_seg_head(s)
            else sum(int(v.get("n", 0)) for v in V._seg_dvs(s).values())
        )
        for s in V._segments(root)
    )
    assert dv_rows <= 10
    # search ≡ from-scratch rebuild at the current corpus version
    build_text_index_from(spark, src, rebuilt, n_files=8)
    got = search_text_index(spark, idx, _TERMS, k=10).collect()
    ref = search_text_index(spark, rebuilt, _TERMS, k=10).collect()
    assert _key(got) == _key(ref)
    assert all(r.doc_id >= 120 for r in got)
    assert (
        manifest_info(idx)["extra"]["n_docs"]
        == manifest_info(rebuilt)["extra"]["n_docs"]
    )
    # token-range pruning bound survives the purge (files not merged)
    kept, total = files_for_read(idx, skip_filter={"token": ("scan", "scan")})
    assert len(kept) <= max(1, total // 3)
    # the maintenance commit carried the stamp: the next refresh is a
    # provable no-op
    assert refresh_text_index(spark, src, idx) is None


def test_maintenance_daemon_accepts_index_tables(spark, tmp_path):
    """r11: run_table_maintenance_stream on an INDEX table path — every
    maintenance rewrite carries the manifest extra (the refresher's
    version stamp) forward, dv_rows_max routes DV debt to a surgical
    purge, and small_bytes=None keeps token-range files unmerged."""
    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import delete_where, manifest_info
    from wrtd_etl_spark.streaming.feed_refresh import (
        run_table_maintenance_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    write_snapshot(docs, src)
    build_text_index_from(spark, src, idx, n_files=8)
    # accrue DV debt WITHOUT self-maintenance
    delete_where(spark, src, F.col("doc_id") < 120)
    refresh_text_index(spark, src, idx, maintain=False)
    stamp = manifest_info(idx)["extra"]["source_version"]
    run_table_maintenance_stream(
        spark,
        idx,
        str(tmp_path / "ckpt"),
        compact_above=10_000,  # only the DV trigger should fire
        small_bytes=None,
        dv_rows_max=10,
    )
    root = V._read_manifest_root(idx, V._read_pointer(idx))
    dv_rows = sum(
        (
            s.get("dv_rows", 0)
            if V._is_seg_head(s)
            else sum(int(v.get("n", 0)) for v in V._seg_dvs(s).values())
        )
        for s in V._segments(root)
    )
    assert dv_rows <= 10
    # the stamp survived the daemon's rewrite: refresh is still a no-op
    assert manifest_info(idx)["extra"]["source_version"] == stamp
    assert refresh_text_index(spark, src, idx) is None
    got = search_text_index(spark, idx, _TERMS, k=10).collect()
    assert all(r.doc_id >= 120 for r in got) and len(got) == 10
