"""Merge-on-read MERGE (r8 flagship): ``merge_into(strategy="dv")``
moves the matched rows' positions into deletion vectors and lands
updates + not-matched inserts as ONE fresh segment — a CDC upsert into
a 100-TB table commits a sidecar plus a few small files, never a file
rewrite. Contract pinned here:

* MoR merge == CoW merge row-for-row (replace / partial mapping /
  delete_when / keep / insert-only), and moves ZERO existing data
  files;
* vectors compose with earlier DV DML; repeat merges never resurrect;
* the change feed folds to the final state (same-version delete+insert
  pair per updated key, insert wins the tiebreak);
* auto falls back to CoW on UNIQUE tables and oversized matches;
  required 'dv' refuses loudly;
* IDENTITY inserts mint contiguously through the DV path too;
* reorg_purge materializes the merge's vectors surgically.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

import wrtd_etl_spark.sources.versioned as V
from wrtd_etl_spark.sources.versioned import (
    add_identity_column,
    add_unique_constraint,
    delete_where,
    describe_table,
    history,
    merge_into,
    read_snapshot,
    reorg_purge,
    table_changes,
    write_snapshot,
)


def _data_files(t):
    return set(glob.glob(os.path.join(t, "data", "*", "*.parquet")))


def _mk(spark, t, n=300, parts=3):
    df = spark.createDataFrame(
        [(i, i * 10, f"s{i % 4}") for i in range(n)],
        "k long, v long, s string",
    ).repartition(parts)
    write_snapshot(df, t, stats_cols=["k"])
    return df


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, s string")


def _snap(spark, t):
    return sorted(
        (r.k, r.v, r.s) for r in read_snapshot(spark, t).collect()
    )


def test_dv_merge_equals_cow_and_moves_no_files(spark, tmp_path):
    rows = [(5, -5, "u"), (7, -7, "u"), (400, 1, "n"), (401, 2, "n")]
    t1, t2 = str(tmp_path / "cow"), str(tmp_path / "dv")
    _mk(spark, t1)
    _mk(spark, t2)
    merge_into(spark, t1, _src(spark, rows), ["k"])
    before = _data_files(t2)
    v = merge_into(spark, t2, _src(spark, rows), ["k"], strategy="dv")
    assert _snap(spark, t1) == _snap(spark, t2)
    # every pre-merge data file is still there; only NEW files appeared
    assert before <= _data_files(t2)
    assert history(t2)[0]["mode"] == "merge_dv"
    assert describe_table(t2)["dv_rows"] == 2  # two matched keys
    # time travel: pre-merge state intact
    assert len(_snap(spark, t2)) == 302
    assert read_snapshot(spark, t2, version=v - 1).count() == 300


def test_dv_merge_partial_mapping_delete_when_and_keep(spark, tmp_path):
    rows = [
        (1, 111, "D"),  # delete
        (2, 222, "U"),  # update
        (500, 5, "U"),  # insert
        (501, 6, "D"),  # delete-of-absent: no-op
    ]
    for when_matched, label in [
        ({"v": "v"}, "partial"),
        ("replace", "replace"),
        ("keep", "keep"),
    ]:
        t1 = str(tmp_path / f"cow_{label}")
        t2 = str(tmp_path / f"dv_{label}")
        _mk(spark, t1, n=50, parts=2)
        _mk(spark, t2, n=50, parts=2)
        kw = dict(
            when_matched=when_matched,
            delete_when=F.col("s") == "D",
        )
        merge_into(spark, t1, _src(spark, rows), ["k"], **kw)
        merge_into(
            spark, t2, _src(spark, rows), ["k"], strategy="dv", **kw
        )
        assert _snap(spark, t1) == _snap(spark, t2), label
    # keep-mode vectors ONLY the delete row
    assert describe_table(str(tmp_path / "dv_keep"))["dv_rows"] == 1


def test_dv_merge_composes_with_prior_dv_and_repeats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=200, parts=2)
    delete_where(spark, t, F.col("k") < 10, strategy="dv")
    merge_into(
        spark, t, _src(spark, [(5, 55, "z"), (20, 200, "z")]), ["k"],
        strategy="dv",
    )
    # k=5 was dv-deleted: the merge re-INSERTS it (not matched)
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got[5] == (55, "z") and got[20] == (200, "z")
    assert 3 not in got  # earlier dv delete holds
    # repeat-merge the same key: the first merge's insert must be
    # vectored by the second, never duplicated
    merge_into(
        spark, t, _src(spark, [(20, 201, "y")]), ["k"], strategy="dv"
    )
    rows = read_snapshot(spark, t).filter("k = 20").collect()
    assert [(r.v, r.s) for r in rows] == [(201, "y")]


def test_dv_merge_change_feed_folds(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=100, parts=2)
    merge_into(
        spark,
        t,
        _src(spark, [(3, 33, "m"), (300, 3, "m")]),
        ["k"],
        strategy="dv",
    )
    ch = table_changes(spark, t, 0)
    fold = {}
    for r in ch.collect():
        fold.setdefault((r.k,), []).append((r._change_type, r.v, r.s))
    assert ("delete", 30, "s3") in fold[(3,)]
    assert ("insert", 33, "m") in fold[(3,)]
    assert fold[(300,)] == [("insert", 3, "m")]
    # physical feed folds to the same state
    from collections import Counter

    from wrtd_etl_spark.sources.versioned import table_changes_physical

    c = Counter()
    for r in table_changes_physical(spark, t, -1).collect():
        c[(r.k, r.v, r.s)] += 1 if r._change_type == "insert" else -1
    assert sorted(x for x, n in c.items() if n > 0) == _snap(spark, t)
    # the STREAMING change feed folds to the same state too (same-
    # version delete+insert pair per merged key; insert wins the tie)
    from wrtd_etl_spark.sources.versioned_stream import (
        VersionedChangesDataSource,
    )

    spark.dataSource.register(VersionedChangesDataSource)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    (
        spark.readStream.format("versioned_changes")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = spark.read.parquet(out)
    last = (
        got.withColumn(
            "__is_del", (F.col("_change_type") == "delete").cast("int")
        )
        .groupBy("k")
        .agg(
            F.max_by(
                F.struct("__is_del", "v", "s"),
                F.struct("_commit_version", 1 - F.col("__is_del")),
            ).alias("x")
        )
        .filter(F.col("x.__is_del") == 0)
        .select("k", F.col("x.v").alias("v"), F.col("x.s").alias("s"))
    )
    assert sorted((r.k, r.v, r.s) for r in last.collect()) == _snap(
        spark, t
    )


def test_dv_merge_interlocks_and_auto_fallback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=60, parts=2)
    add_unique_constraint(spark, t, "uk", ["k"])
    with pytest.raises(ValueError, match="UNIQUE"):
        merge_into(
            spark, t, _src(spark, [(1, 1, "x")]), ["k"], strategy="dv"
        )
    # auto: falls back to CoW, still lands
    merge_into(
        spark, t, _src(spark, [(1, 1, "x")]), ["k"], strategy="auto"
    )
    assert history(t)[0]["mode"] == "merge"
    assert read_snapshot(spark, t).filter("k = 1").collect()[0].v == 1
    # by-source sync is inherently CoW
    t2 = str(tmp_path / "t2")
    _mk(spark, t2, n=30, parts=1)
    with pytest.raises(ValueError, match="when_not_matched_by_source"):
        merge_into(
            spark,
            t2,
            _src(spark, [(1, 1, "x")]),
            ["k"],
            strategy="dv",
            when_not_matched_by_source="delete",
        )
    # position cap: auto falls back to CoW
    old = V.DV_MAX_POSITIONS
    V.DV_MAX_POSITIONS = 2
    try:
        merge_into(
            spark,
            t2,
            _src(spark, [(i, 0, "c") for i in range(10)]),
            ["k"],
            strategy="auto",
        )
        assert history(t2)[0]["mode"] == "merge"
    finally:
        V.DV_MAX_POSITIONS = old


def test_dv_merge_identity_mints_contiguously(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([], "k long, v long"), t, stats_cols=["k"]
    )
    add_identity_column(t, "id")
    write_snapshot(
        spark.createDataFrame([(i, 0) for i in range(20)], "k long, v long"),
        t,
        mode="append",
    )
    merge_into(
        spark,
        t,
        spark.createDataFrame(
            [(5, 55), (100, 1), (101, 2)], "k long, v long"
        ),
        ["k"],
        strategy="dv",
    )
    got = read_snapshot(spark, t)
    ids = sorted(r.id for r in got.collect())
    assert ids == list(range(1, 23))  # 20 + 2 fresh, contiguous, no dup
    assert got.filter("k = 5").collect()[0].v == 55
    assert history(t)[0]["mode"] == "merge_dv"


def test_dv_merge_insert_only_and_empty_source(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=40, parts=1)
    before = _data_files(t)
    # insert-only (keep): matched rows untouched, zero vectors
    merge_into(
        spark,
        t,
        _src(spark, [(1, 0, "x"), (900, 9, "x")]),
        ["k"],
        when_matched="keep",
        strategy="dv",
    )
    assert describe_table(t)["dv_rows"] == 0
    assert before <= _data_files(t)
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got[1] == 10 and got[900] == 9
    # empty source: metadata-only commit, state unchanged
    v = merge_into(
        spark,
        t,
        spark.createDataFrame([], "k long, v long, s string"),
        ["k"],
        strategy="dv",
    )
    assert v == V._read_pointer(t)
    assert len(got) == read_snapshot(spark, t).count()


def test_reorg_purge_after_dv_merge(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=120, parts=2)
    merge_into(
        spark,
        t,
        _src(spark, [(i, -i, "p") for i in range(0, 30)]),
        ["k"],
        strategy="dv",
    )
    assert describe_table(t)["dv_rows"] == 30
    snap = _snap(spark, t)
    assert reorg_purge(spark, t) is not None
    assert describe_table(t)["dv_rows"] == 0
    assert _snap(spark, t) == snap


def test_concurrent_dv_merges_one_writer_loses_cleanly(spark, tmp_path):
    """Two MoR merges racing from the same base: exactly one commits;
    the loser raises CommitConflict; the table equals the winner's
    result — vectors are never half-applied (the dv sidecar links only
    through the winning manifest)."""
    import threading

    from wrtd_etl_spark.sources.versioned import CommitConflict

    t = str(tmp_path / "tbl")
    _mk(spark, t, n=50, parts=2)
    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def racer(name, key, val):
        src = spark.createDataFrame(
            [(key, val, name)], "k long, v long, s string"
        )
        barrier.wait()
        try:
            results[name] = merge_into(
                spark, t, src, ["k"], prune=None, strategy="dv"
            )
        except CommitConflict as e:
            results[name] = e

    ts = [
        threading.Thread(target=racer, args=(n, k, v))
        for n, k, v in (("a", 1, 101), ("b", 2, 202))
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    outcomes = list(results.values())
    winners = [r for r in outcomes if isinstance(r, int)]
    losers = [r for r in outcomes if isinstance(r, CommitConflict)]
    assert len(winners) + len(losers) == 2 and len(winners) >= 1
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert len(got) == 50  # no dup, no loss
    if len(winners) == 2:
        assert got[1] == 101 and got[2] == 202
    else:
        w = [n for n, r in results.items() if isinstance(r, int)][0]
        k, v = (1, 101) if w == "a" else (2, 202)
        assert got[k] == v
        other_k = 2 if k == 1 else 1
        assert got[other_k] == other_k * 10  # loser's edit NOT applied


def test_dv_merge_rebases_over_disjoint_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A concurrent APPEND provably disjoint from the source keys
    commutes with a MoR merge (same logical rule as the CoW merge):
    the rebase carries the appended segment and the commit lands."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _mk(spark, t, n=50, parts=2)

    # inject an append AFTER the merge snapshots its base
    real = V._dv_candidate_scan
    fired = {}

    def hook(*a, **kw):
        if not fired:
            fired["x"] = True
            write_snapshot(
                spark.createDataFrame(
                    [(900, 9, "app")], "k long, v long, s string"
                ),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return real(*a, **kw)

    monkeypatch.setattr(V, "_dv_candidate_scan", hook)
    merge_into(
        spark,
        t,
        _src(spark, [(1, 111, "m")]),
        ["k"],
        strategy="dv",
    )
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got[1] == 111 and got[900] == 9 and len(got) == 51


def test_dv_merge_evolves_schema(spark, tmp_path):
    """r8: evolve_schema composes with the MoR path — the CDC batch
    gained a column; matched rows vector away, the fresh segment writes
    the WIDENED schema, old files NULL-pad on read; equals the CoW
    evolving merge row-for-row."""
    t1, t2 = str(tmp_path / "cow"), str(tmp_path / "dv")
    for t in (t1, t2):
        write_snapshot(
            spark.createDataFrame(
                [(i, i * 10) for i in range(40)], "k long, v long"
            ).repartition(2),
            t,
            stats_cols=["k"],
        )
    src = spark.createDataFrame(
        [(1, 111, "new1"), (100, 1, "new2")], "k long, v long, tag string"
    )
    merge_into(spark, t1, src, ["k"], evolve_schema=True)
    merge_into(spark, t2, src, ["k"], evolve_schema=True, strategy="dv")
    assert history(t2)[0]["mode"] == "merge_dv"
    a = sorted(
        (r.k, r.v, r.tag) for r in read_snapshot(spark, t1).collect()
    )
    b = sorted(
        (r.k, r.v, r.tag) for r in read_snapshot(spark, t2).collect()
    )
    assert a == b
    got = {r.k: (r.v, r.tag) for r in read_snapshot(spark, t2).collect()}
    assert got[1] == (111, "new1") and got[100] == (1, "new2")
    assert got[2] == (20, None)  # old rows pad the new column
    # follow-up plain merge on the evolved table still works MoR
    merge_into(
        spark,
        t2,
        spark.createDataFrame([(2, 222, "t")], "k long, v long, tag string"),
        ["k"],
        strategy="dv",
    )
    got = {r.k: (r.v, r.tag) for r in read_snapshot(spark, t2).collect()}
    assert got[2] == (222, "t")


def test_dv_commits_record_operation_metrics(spark, tmp_path):
    """r8: DESCRIBE HISTORY parity — merge-on-read DML records the row
    counts it already computed (never a new job) and history surfaces
    them."""
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=60, parts=2)
    merge_into(
        spark,
        t,
        _src(spark, [(1, 11, "D"), (2, 22, "U"), (900, 9, "U")]),
        ["k"],
        delete_when=F.col("s") == "D",
        strategy="dv",
    )
    delete_where(spark, t, F.col("k") < 5, strategy="dv")
    from wrtd_etl_spark.sources.versioned import update_where

    update_where(
        spark, t, F.col("k") >= 58, {"v": F.lit(0)}, strategy="dv"
    )
    h = history(t)
    assert h[0]["metrics"] == {"rows_updated": 3}  # 58, 59, 900
    assert h[1]["metrics"] == {"rows_deleted": 4}  # 0,2,3,4 (1 gone)
    assert h[2]["metrics"] == {
        "rows_matched": 2,
        "rows_deleted": 1,
        "rows_updated": 1,
        "rows_inserted": 1,
    }
    assert "metrics" not in h[3]  # the bootstrap overwrite records none
    # a metadata-only props commit must NOT inherit the last metrics
    from wrtd_etl_spark.sources.versioned import add_check_constraint

    add_check_constraint(spark, t, "vnn", "v IS NOT NULL OR v IS NULL")
    assert "metrics" not in history(t)[0]


def test_logical_changes_dv_fast_path_plans_delta_only(spark, tmp_path):
    """r8: table_changes over a range whose commits only add files or
    grow vectors (append/dv DML) routes to the manifest-planned
    physical delta — the plan reads ONLY changed files, never both
    snapshots through exceptAll."""
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=200, parts=4)  # v0: 4 files
    write_snapshot(  # v1: append
        _src(spark, [(500 + i, i, "a") for i in range(10)]),
        t,
        mode="append",
    )
    delete_where(spark, t, F.col("k") < 10, strategy="dv")  # v2
    merge_into(  # v3
        spark, t, _src(spark, [(20, 2020, "m"), (600, 6, "m")]), ["k"],
        strategy="dv",
    )
    ch = table_changes(spark, t, 0)
    assert set(ch.columns) == {"k", "v", "s", "_change_type"}
    fold = {}
    for r in ch.collect():
        fold.setdefault(r.k, []).append((r._change_type, r.v))
    assert ("insert", 0) in fold[500]  # appended row (500, 0, "a")
    assert fold[0] == [("delete", 0)]
    assert ("delete", 200) in fold[20] and ("insert", 2020) in fold[20]
    # the plan read only the CHANGED files: v1's append files, the two
    # dv-shadowed base files' delta rows, and v3's insert segment —
    # never all 4 base files twice (the exceptAll shape)
    read_files = {os.path.basename(p) for p in ch.inputFiles()}
    m0 = V._read_manifest(t, 0)
    base_files = {os.path.basename(f) for f in m0["files"]}
    assert len(base_files & read_files) < len(base_files)
    # a CoW rewrite in the range falls back to the honest snapshot diff
    delete_where(spark, t, F.col("k") == 30, strategy="cow")  # v4
    ch2 = table_changes(spark, t, 0)
    got = {r.k for r in ch2.filter("_change_type = 'delete'").collect()}
    assert 30 in got and 0 in got
