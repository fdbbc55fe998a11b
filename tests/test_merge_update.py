"""MERGE INTO + copy-on-write UPDATE on versioned tables
(sources/versioned.py merge_into / update_where).

Reference capability being scaled: INSERT ... ON CONFLICT DO UPDATE
(functions.py:178-183) and UPDATE messages SET posted = TRUE
(bot/botrun.py:163-167, 308-309) — one atomic commit each, surgical file
rewrite via manifest stats, history untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    data_file_count,
    history,
    latest_version,
    merge_into,
    read_snapshot,
    table_changes,
    update_where,
    write_snapshot,
)


def _rows(df):
    return sorted((r.k, r.v, r.s) for r in df.collect())


def _base(spark, t, layout=True):
    df = spark.createDataFrame(
        [(i, i * 10, f"s{i}") for i in range(20)], "k long, v long, s string"
    )
    kwargs = {"layout_by": ["k"], "layout_files": 4} if layout else {}
    write_snapshot(df, t, **kwargs)
    return df


def test_merge_update_insert_delete_in_one_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    src = spark.createDataFrame(
        [
            (3, 999, "upd", "U"),   # matched update
            (7, 0, "x", "D"),       # matched delete
            (100, 42, "new", "U"),  # not matched insert
            (200, 0, "x", "D"),     # unmatched delete -> no-op
        ],
        "k long, v long, s string, op string",
    )
    v = merge_into(
        spark, t, src, ["k"], delete_when=F.col("op") == "D"
    )
    assert v == 1  # ONE commit
    assert latest_version(t) == 1
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got[3] == (999, "upd")
    assert 7 not in got
    assert got[100] == (42, "new")
    assert 200 not in got
    assert got[5] == (50, "s5")  # untouched row intact
    # time travel reads the pre-merge state
    pre = {r.k: (r.v, r.s) for r in read_snapshot(spark, t, version=0).collect()}
    assert pre[3] == (30, "s3") and 7 in pre and 100 not in pre
    assert history(t)[0]["mode"] == "merge"


def test_merge_equivalent_to_delete_plus_upsert(spark, tmp_path):
    """merge == the old two-commit decomposition (delete_where of the
    delete keys, then upsert of the update/insert rows) — same final
    rows, but in ONE version instead of two."""
    from wrtd_etl_spark.sources.versioned import delete_where

    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    _base(spark, t1)
    _base(spark, t2)
    src = spark.createDataFrame(
        [(2, -2, "u2", "U"), (11, -11, "u11", "U"), (4, 0, "", "D"),
         (77, -77, "new", "U")],
        "k long, v long, s string, op string",
    )
    merge_into(spark, t1, src, ["k"], delete_when=F.col("op") == "D")

    # two-commit path on the twin table
    delete_where(spark, t2, F.col("k") == 4)
    ups = src.filter(F.col("op") == "U").drop("op")
    cur = read_snapshot(spark, t2)
    merged = ups.unionByName(
        cur.join(ups.select("k"), "k", "left_anti")
    )
    write_snapshot(merged, t2)

    assert _rows(read_snapshot(spark, t1)) == _rows(read_snapshot(spark, t2))
    assert latest_version(t1) == 1 and latest_version(t2) == 2


def test_merge_auto_prune_carries_untouched_files(spark, tmp_path):
    """Source keys all land in one z-ordered file's range: the other
    files must carry by REFERENCE (same relative paths in the manifest),
    not be rewritten."""
    from wrtd_etl_spark.sources.versioned import files_for_read

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10, f"s{i}") for i in range(400)], "k long, v long, s string"
    )
    write_snapshot(df, t, layout_by=["k"], layout_files=8)
    before = set(files_for_read(t)[0])
    n_before = data_file_count(t)
    src = spark.createDataFrame([(5, -5, "u5")], "k long, v long, s string")
    merge_into(spark, t, src, ["k"])
    after = set(files_for_read(t)[0])
    carried = before & after
    # at least half the layout files carried untouched
    assert len(carried) >= n_before // 2
    assert len(after - before) >= 1  # the rewritten segment is new
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got[5] == -5 and got[300] == 3000 and len(got) == 400


def test_merge_partial_update_mapping_and_insert_nullfill(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame(
        [(1, "nick1"), (500, "nick500")], "k long, nickname string"
    )
    # ON CONFLICT DO UPDATE SET s = EXCLUDED.nickname
    merge_into(spark, t, src, ["k"], when_matched={"s": "nickname"})
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got[1] == (10, "nick1")      # v untouched, s updated
    assert got[500] == (None, None)     # insert NULL-fills absent cols
    assert got[2] == (20, "s2")


def test_merge_keep_is_insert_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame(
        [(1, 111, "xx"), (300, 3, "new")], "k long, v long, s string"
    )
    merge_into(spark, t, src, ["k"], when_matched="keep")
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got[1] == (10, "s1")  # matched row untouched
    assert got[300] == (3, "new")


def test_merge_refuses_duplicate_source_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k long, v long, s string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(spark, t, src, ["k"])
    assert latest_version(t) == 0  # refused BEFORE any commit


def test_update_where_prunes_files_and_feeds_changes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10, f"s{i}") for i in range(400)], "k long, v long, s string"
    )
    write_snapshot(df, t, layout_by=["k"], layout_files=8)
    from wrtd_etl_spark.sources.versioned import files_for_read

    before = set(files_for_read(t)[0])
    v = update_where(
        spark,
        t,
        F.col("k").between(10, 15),
        {"s": F.lit("flagged"), "v": F.col("v") + 1},
        prune={"k": (10, 15)},
    )
    assert v == 1
    after = set(files_for_read(t)[0])
    assert len(before & after) >= len(before) // 2  # pruned rewrite
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    for k in range(10, 16):
        assert got[k] == (k * 10 + 1, "flagged")
    assert got[200] == (2000, "s200")
    assert len(got) == 400
    # time travel: pre-update state intact
    pre = {r.k: r.s for r in read_snapshot(spark, t, version=0).collect()}
    assert pre[12] == "s12"
    # change feed: an update is delete+insert pairs for exactly the
    # touched rows
    feed = table_changes(spark, t, 0, 1)
    by_type = {
        (r._change_type, r.k) for r in feed.collect()
    }
    for k in range(10, 16):
        assert ("delete", k) in by_type and ("insert", k) in by_type
    assert len(by_type) == 12
    assert history(t)[0]["mode"] == "update"


def test_update_where_null_predicate_rows_kept(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, None, "b"), (3, 30, "c")],
        "k long, v long, s string",
    )
    write_snapshot(df, t)
    update_where(spark, t, F.col("v") > 15, {"s": F.lit("big")})
    got = {r.k: r.s for r in read_snapshot(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "big"}  # NULL predicate -> unmatched


def test_update_where_refuses_unknown_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    with pytest.raises(ValueError, match="unknown column"):
        update_where(spark, t, F.lit(True), {"nope": F.lit(1)})


def test_merge_evolve_schema_adds_source_column(spark, tmp_path):
    """evolve_schema=True: a CDC source that gained a column widens the
    table in the SAME merge commit — old rows NULL-fill, matched rows
    take the new value, inserts carry it; op flags stay out via
    source_meta_cols; time travel still reads the narrow schema."""
    from wrtd_etl_spark.sources.versioned import manifest_info

    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame(
        [
            (1, 111, "u1", "gold", "U"),
            (300, 3, "new", "silver", "U"),
            (4, 0, "", None, "D"),
        ],
        "k long, v long, s string, tier string, op string",
    )
    v = merge_into(
        spark,
        t,
        src,
        ["k"],
        delete_when=F.col("op") == "D",
        evolve_schema=True,
        source_meta_cols=["op"],
    )
    assert v == 1
    got = {r.k: (r.v, r.s, r.tier) for r in read_snapshot(spark, t).collect()}
    assert got[1] == (111, "u1", "gold")
    assert got[300] == (3, "new", "silver")
    assert got[2] == (20, "s2", None)  # old row NULL-fills the new column
    assert 4 not in got
    assert "op" not in read_snapshot(spark, t).columns
    # the committed table schema gained the column (segment-aware read
    # machinery only engages when segments DIFFER — a fully rewritten
    # table is uniform, so schema_evolved may legitimately stay False)
    assert "tier" in [
        f["name"] for f in manifest_info(t)["schema"]["fields"]
    ]
    # time travel: version 0 still has the narrow schema
    assert "tier" not in read_snapshot(spark, t, version=0).columns


def test_merge_without_evolve_drops_unknown_source_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame(
        [(1, 111, "u1", "gold")], "k long, v long, s string, tier string"
    )
    merge_into(spark, t, src, ["k"])
    out = read_snapshot(spark, t)
    assert "tier" not in out.columns
    assert {r.v for r in out.filter(F.col("k") == 1).collect()} == {111}


def test_merge_evolve_refuses_source_only_key(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    src = spark.createDataFrame([(1, 5)], "k2 long, v long")
    with pytest.raises(ValueError, match="merge key"):
        merge_into(spark, t, src, ["k2"], evolve_schema=True)


def test_merge_evolve_with_pruned_carry_reads_mixed_segments(spark, tmp_path):
    """Evolving merge that CARRIES old-schema files: the new version
    mixes segment schemas, so the segment-aware read must NULL-pad the
    carried files' missing column."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10, f"s{i}") for i in range(400)], "k long, v long, s string"
    )
    write_snapshot(df, t, layout_by=["k"], layout_files=8)
    src = spark.createDataFrame(
        [(5, -5, "u5", "gold")], "k long, v long, s string, tier string"
    )
    merge_into(spark, t, src, ["k"], evolve_schema=True)
    got = {r.k: (r.v, r.tier) for r in read_snapshot(spark, t).collect()}
    assert got[5] == (-5, "gold")
    assert got[399] == (3990, None)  # carried old-schema file NULL-pads
    assert len(got) == 400


def test_merge_fold_matches_dict_model_over_random_batches(spark, tmp_path):
    """Model-based: a sequence of random CDC batches folded through
    merge_into must equal a plain python dict fold (upsert/delete by
    key) — the semantics Postgres ON CONFLICT gives row-at-a-time,
    checked wholesale."""
    import random

    rng = random.Random(7)
    t = str(tmp_path / "tbl")
    model: dict[int, tuple] = {}
    base = [(k, k * 2, f"s{k}") for k in range(0, 30, 2)]
    for k, v, s in base:
        model[k] = (v, s)
    write_snapshot(
        spark.createDataFrame(base, "k long, v long, s string"),
        t,
        layout_by=["k"],
        layout_files=3,
    )
    for _ in range(4):
        batch = []
        for k in rng.sample(range(40), rng.randint(1, 8)):
            if rng.random() < 0.3:
                batch.append((k, 0, "", "D"))
                model.pop(k, None)
            else:
                v, s = rng.randint(-99, 99), f"u{rng.randint(0, 9)}"
                batch.append((k, v, s, "U"))
                model[k] = (v, s)
        merge_into(
            spark,
            t,
            spark.createDataFrame(batch, "k long, v long, s string, op string"),
            ["k"],
            delete_when=F.col("op") == "D",
        )
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got == model


def test_concurrent_merge_one_writer_loses_cleanly(spark, tmp_path):
    """Two merges racing from the same base: exactly one commits, the
    other raises CommitConflict, and the table equals the winner's
    result (no torn state, no lost files)."""
    import threading

    from wrtd_etl_spark.sources.versioned import CommitConflict

    t = str(tmp_path / "tbl")
    _base(spark, t, layout=False)
    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def racer(name, key, val):
        src = spark.createDataFrame(
            [(key, val, name)], "k long, v long, s string"
        )
        barrier.wait()
        try:
            results[name] = merge_into(spark, t, src, ["k"], prune=None)
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
    # table is exactly the winner's merge (readable, consistent)
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert len(got) == 20
    if len(winners) == 2:  # serialized by luck: both applied
        assert got[1] == 101 and got[2] == 202
    else:
        w = [n for n, r in results.items() if isinstance(r, int)][0]
        k, v = (1, 101) if w == "a" else (2, 202)
        assert got[k] == v


def test_update_fold_matches_dict_model_over_random_batches(spark, tmp_path):
    """Model-based: random update_where predicates folded against a dict
    model — matched rows mutate, NULL-predicate rows never do."""
    import random

    rng = random.Random(11)
    t = str(tmp_path / "tbl")
    rows = [
        (k, rng.randint(-50, 50) if rng.random() > 0.2 else None, f"s{k}")
        for k in range(40)
    ]
    model = {k: (v, s) for k, v, s in rows}
    write_snapshot(
        spark.createDataFrame(rows, "k long, v long, s string"),
        t,
        layout_by=["k"],
        layout_files=4,
    )
    for i in range(3):
        lo, hi = sorted(rng.sample(range(-50, 51), 2))
        update_where(
            spark,
            t,
            F.col("v").between(lo, hi),
            {"s": F.lit(f"hit{i}"), "v": F.col("v") + 1},
        )
        for k, (v, s) in model.items():
            if v is not None and lo <= v <= hi:
                model[k] = (v + 1, f"hit{i}")
    got = {r.k: (r.v, r.s) for r in read_snapshot(spark, t).collect()}
    assert got == model


def test_physical_changes_fold_equals_logical_and_never_shuffles(spark, tmp_path):
    """table_changes_physical: (a) fold == logical table_changes fold ==
    final snapshot across append + update + merge lineage; (b) appends
    are byte-identical to the logical feed; (c) the plan has ZERO
    exchanges (the entire point vs the exceptAll fallback)."""
    from collections import Counter

    from wrtd_etl_spark.sources.versioned import table_changes_physical

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(k, k * 10, f"s{k}") for k in range(20)], "k long, v long, s string"
        ),
        t,
    )
    write_snapshot(
        spark.createDataFrame([(100, 1, "a")], "k long, v long, s string"),
        t,
        mode="append",
    )
    update_where(spark, t, F.col("k") < 2, {"v": F.col("v") + 1})
    merge_into(
        spark,
        t,
        spark.createDataFrame([(5, -5, "m"), (200, 2, "n")], "k long, v long, s string"),
        ["k"],
    )
    phys = table_changes_physical(spark, t, -1)
    fold = Counter()
    for r in phys.collect():
        fold[(r.k, r.v, r.s)] += 1 if r._change_type == "insert" else -1
    final = sorted(x for x, n in fold.items() if n > 0)
    assert all(n in (0, 1) for n in fold.values())
    snap = sorted((r.k, r.v, r.s) for r in read_snapshot(spark, t).collect())
    assert final == snap
    # append-only range: physical == logical exactly
    phys01 = sorted(
        (r.k, r.v, r.s, r._change_type)
        for r in table_changes_physical(spark, t, 0, 1).collect()
    )
    logi01 = sorted(
        (r.k, r.v, r.s, r._change_type)
        for r in table_changes(spark, t, 0, 1).collect()
    )
    assert phys01 == logi01 == [(100, 1, "a", "insert")]
    # zero exchanges: manifest-planned file reads + unions only
    plan = phys._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # metadata rides along
    assert {r._commit_mode for r in phys.collect()} == {
        "overwrite", "append", "update", "merge"
    }


def test_merge_not_matched_by_source_delete_syncs_full_snapshot(
    spark, tmp_path
):
    """Full-snapshot dimension sync in ONE atomic commit: matched rows
    update, new source keys insert, target keys ABSENT from the source
    delete — verified against a DuckDB full-outer merge over the same
    rows."""
    import duckdb

    t = str(tmp_path / "tbl")
    _base(spark, t)  # k 0..19, v = 10k, s = f"s{k}"
    src_rows = [(k, k * 100, f"n{k}") for k in range(10, 25)]
    src = spark.createDataFrame(src_rows, "k long, v long, s string")
    v = merge_into(
        spark,
        t,
        src,
        ["k"],
        when_matched={"v": "v"},  # partial update: s keeps target value
        when_not_matched_by_source="delete",
    )
    assert v == 1 and history(t)[0]["mode"] == "merge"
    got = sorted(
        (r.k, r.v, r.s) for r in read_snapshot(spark, t).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {i*10}, 's{i}')" for i in range(20))
        + ") AS t(k, v, s)"
    )
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, {v2}, '{s}')" for k, v2, s in src_rows)
        + ") AS t(k, v, s)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT t.k, s.v, t.s FROM tgt t JOIN src s USING (k)
            UNION ALL
            SELECT s.k, s.v, s.s FROM src s
            WHERE s.k NOT IN (SELECT k FROM tgt)
            """
        ).fetchall()
    )
    assert got == want
    # time travel still reads the pre-sync dimension
    assert len(read_snapshot(spark, t, version=0).collect()) == 20


def test_merge_not_matched_by_source_update_marks_stale(spark, tmp_path):
    """The dict form: target rows missing from the source get the update
    applied (soft-delete flag) instead of being removed."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10, True) for i in range(10)], "k long, v long, active boolean"
    )
    write_snapshot(df, t, layout_by=["k"], layout_files=2)
    src = spark.createDataFrame(
        [(k, k * 100) for k in range(5, 8)], "k long, v long"
    )
    merge_into(
        spark,
        t,
        src,
        ["k"],
        when_not_matched_by_source={"active": F.lit(False)},
    )
    got = {r.k: (r.v, r.active) for r in read_snapshot(spark, t).collect()}
    for k in range(5, 8):
        assert got[k] == (k * 100, True)  # matched: replaced, stays active
    for k in list(range(5)) + [8, 9]:
        assert got[k] == (k * 10, False)  # unmatched: kept, marked stale
    # and the clustered layout survived the full rewrite
    from wrtd_etl_spark.sources.versioned import files_for_read

    kept, total = files_for_read(t, skip_filter={"k": (0, 2)})
    assert len(kept) < total


def test_merge_not_matched_by_source_refuses_explicit_prune(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    src = spark.createDataFrame([(1, 1, "x")], "k long, v long, s string")
    with pytest.raises(ValueError, match="prune cannot be combined"):
        merge_into(
            spark,
            t,
            src,
            ["k"],
            prune={"k": (1, 1)},
            when_not_matched_by_source="delete",
        )
    with pytest.raises(ValueError, match="unknown"):
        merge_into(
            spark, t, src, ["k"],
            when_not_matched_by_source={"nope": F.lit(1)},
        )


# --------------------------------------------------------------------------
# replace_where — atomic partial overwrite (Delta replaceWhere)
# --------------------------------------------------------------------------


def test_replace_where_swaps_slice_atomically(spark, tmp_path):
    """ONE commit deletes the slice and inserts its recomputation; the
    un-pruned files carry by reference; history records one version."""
    from wrtd_etl_spark.sources.versioned import files_for_read, replace_where

    t = str(tmp_path / "tbl")
    _base(spark, t)  # k 0..19 clustered over 4 files
    before = set(files_for_read(t)[0])
    repl = spark.createDataFrame(
        [(k, -1, "new") for k in range(5, 10)], "k long, v long, s string"
    )
    v = replace_where(
        spark,
        t,
        (F.col("k") >= 5) & (F.col("k") < 10),
        repl,
        prune={"k": (5, 9)},
    )
    assert v == 1 and history(t)[0]["mode"] == "replace"
    got = _rows(read_snapshot(spark, t))
    want = sorted(
        [(k, k * 10, f"s{k}") for k in range(20) if not 5 <= k < 10]
        + [(k, -1, "new") for k in range(5, 10)]
    )
    assert got == want
    # pruning carried the untouched clustered files forward
    assert before & set(files_for_read(t)[0]), "replace rewrote every file"
    # time travel reads the pre-replace slice
    assert _rows(read_snapshot(spark, t, version=0)) == sorted(
        (k, k * 10, f"s{k}") for k in range(20)
    )


def test_replace_where_refuses_nonconforming_rows(spark, tmp_path):
    """A replacement row outside the slice would escape the next
    backfill — refused, nothing committed."""
    from wrtd_etl_spark.sources.versioned import replace_where

    t = str(tmp_path / "tbl")
    _base(spark, t)
    bad = spark.createDataFrame(
        [(5, -1, "in"), (15, -1, "OUT")], "k long, v long, s string"
    )
    with pytest.raises(ValueError, match="do not satisfy"):
        replace_where(spark, t, (F.col("k") >= 5) & (F.col("k") < 10), bad)
    assert latest_version(t) == 0


def test_replace_where_null_predicate_rows_kept_and_nullfill(spark, tmp_path):
    """SQL semantics: NULL-predicate rows survive; replacement columns
    absent from df null-fill like a merge insert."""
    from wrtd_etl_spark.sources.versioned import replace_where

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10, "a"), (2, None, "b"), (3, 30, "c")],
            "k long, v long, s string",
        ),
        t,
    )
    repl = spark.createDataFrame([(3, 99)], "k long, v long")  # no s
    replace_where(spark, t, F.col("v") > 20, repl)
    got = _rows(read_snapshot(spark, t))
    assert got == sorted([(1, 10, "a"), (2, None, "b"), (3, 99, None)])


def test_replace_where_empty_slice_is_pure_insert(spark, tmp_path):
    """A predicate matching nothing still lands df (recomputing a slice
    that was previously empty)."""
    from wrtd_etl_spark.sources.versioned import replace_where

    t = str(tmp_path / "tbl")
    _base(spark, t)
    repl = spark.createDataFrame(
        [(100, 0, "x")], "k long, v long, s string"
    )
    replace_where(
        spark, t, F.col("k") >= 100, repl, prune={"k": (100, None)}
    )
    assert (100, 0, "x") in _rows(read_snapshot(spark, t))
    assert read_snapshot(spark, t).count() == 21


# --------------------------------------------------------------------------
# Optimistic concurrency: rewrites rebase over concurrent appends
# --------------------------------------------------------------------------


def _hook_append_during_rewrite(monkeypatch, spark, t, rows, schema):
    """Commit an append AFTER the rewrite has pinned its base manifest
    but BEFORE its commit — the deterministic version of the race."""
    import wrtd_etl_spark.sources.versioned as V

    real = V._rewrite_segment
    state = {"done": False}

    def hooked(*a, **k):
        if not state["done"]:
            state["done"] = True
            write_snapshot(
                spark.createDataFrame(rows, schema), t, mode="append"
            )
        return real(*a, **k)

    monkeypatch.setattr(V, "_rewrite_segment", hooked)


def test_delete_where_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """WriteSerializable (the default, Delta's too): a concurrent plain
    append no longer aborts a delete — its rows carry untouched, the
    delete applies to the base snapshot, nothing is lost."""
    from wrtd_etl_spark.sources.versioned import delete_where

    t = str(tmp_path / "tbl")
    _base(spark, t)
    _hook_append_during_rewrite(
        monkeypatch, spark, t, [(100, 0, "late")], "k long, v long, s string"
    )
    v = delete_where(spark, t, F.col("k") < 5)
    assert v == 2  # append won v1; the delete rebased onto it
    got = {r.k for r in read_snapshot(spark, t).collect()}
    assert got == set(range(5, 20)) | {100}
    assert history(t)[0]["mode"] == "delete"


def test_update_where_serializable_isolation_still_raises(
    spark, tmp_path, monkeypatch
):
    from wrtd_etl_spark.sources.versioned import CommitConflict

    t = str(tmp_path / "tbl")
    _base(spark, t)
    _hook_append_during_rewrite(
        monkeypatch, spark, t, [(100, 0, "late")], "k long, v long, s string"
    )
    with pytest.raises(CommitConflict):
        update_where(
            spark,
            t,
            F.col("k") < 5,
            {"v": F.lit(-1)},
            isolation="serializable",
        )


def test_merge_rebases_only_over_provably_disjoint_append(
    spark, tmp_path, monkeypatch
):
    """Merge demands a commutation PROOF: the appended files' stats must
    rule out every source key. Disjoint append → rebase succeeds with
    both effects; overlapping append → CommitConflict (a blind rebase
    would lose the matched-update of the appended row)."""
    from wrtd_etl_spark.sources.versioned import CommitConflict

    t = str(tmp_path / "tbl")
    _base(spark, t)  # layout on k → appends inherit k stats
    src = spark.createDataFrame([(1, 111, "m")], "k long, v long, s string")
    _hook_append_during_rewrite(
        monkeypatch, spark, t, [(500, 0, "far")], "k long, v long, s string"
    )
    v = merge_into(spark, t, src, ["k"])
    assert v == 2
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got[1] == 111 and got[500] == 0 and len(got) == 21

    t2 = str(tmp_path / "tbl2")
    _base(spark, t2)
    _hook_append_during_rewrite(
        monkeypatch, spark, t2, [(1, 999, "clash")], "k long, v long, s string"
    )
    with pytest.raises(CommitConflict):
        merge_into(
            spark,
            t2,
            spark.createDataFrame([(1, 111, "m")], "k long, v long, s string"),
            ["k"],
        )


def test_rewrite_rebase_preserves_append_ledger(spark, tmp_path, monkeypatch):
    """The streaming exactly-once contract survives a rebase: the
    concurrent append's manifest ``extra`` (batch-id ledger) is adopted
    by the rebased rewrite, not clobbered with the base's."""
    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.sources.versioned import delete_where, manifest_info

    t = str(tmp_path / "tbl")
    _base(spark, t)

    real = V._rewrite_segment
    state = {"done": False}

    def hooked(*a, **k):
        if not state["done"]:
            state["done"] = True
            write_snapshot(
                spark.createDataFrame([(100, 0, "x")], "k long, v long, s string"),
                t,
                mode="append",
                extra={"batch_ids": [7]},
            )
        return real(*a, **k)

    monkeypatch.setattr(V, "_rewrite_segment", hooked)
    delete_where(spark, t, F.col("k") < 5)
    assert manifest_info(t)["extra"] == {"batch_ids": [7]}


def test_physical_changes_skip_filter_prunes_files(spark, tmp_path):
    """r8: the batch physical feed takes the streaming source's
    subscriber-predicate contract — skip_filter prunes changed files by
    manifest stats before any read, results equal the post-filtered
    unpruned feed, and the plan touches fewer files."""
    from wrtd_etl_spark.sources.versioned import (
        delete_where,
        table_changes_physical,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(k, k % 5, f"s{k}") for k in range(4000)],
            "k long, v long, s string",
        ).repartition(8),
        t,
        layout_by=["k"],
        layout_files=8,
    )
    write_snapshot(
        spark.createDataFrame(
            [(k, 1, "a") for k in range(4000, 4100)],
            "k long, v long, s string",
        ),
        t,
        mode="append",
        stats_cols=["k"],
    )
    delete_where(
        spark, t, F.col("k") < 100, prune={"k": (None, 99)}, strategy="dv"
    )
    full = table_changes_physical(spark, t, 0)
    pruned = table_changes_physical(spark, t, 0, skip_filter={"k": (0, 150)})
    want = sorted(
        (r.k, r._change_type)
        for r in full.collect()
        if 0 <= r.k <= 150
    )
    got_all = sorted((r.k, r._change_type) for r in pruned.collect())
    got = [x for x in got_all if 0 <= x[0] <= 150]
    assert got == want  # over-approximation: superset filtered == exact
    assert len(pruned.inputFiles()) < len(full.inputFiles())
