"""GENERATED AS IDENTITY columns (r6 verdict ask #3): distributed
CONTIGUOUS surrogate keys — the reference's Postgres ``serial``
(create_tables.sql:3), which ``monotonically_increasing_id`` explicitly
does not provide (63-bit partition-salted, gappy).

Contract pinned here:
* density: after any sequence of appends / merges, the ids are exactly
  ``start, start+step, …`` with no gaps and no duplicates;
* GENERATED ALWAYS: supplying the column is refused on every write path
  (write/merge source/merge update map/update_where/replace_where);
* merge's not-matched inserts mint fresh ids, matched rows keep theirs;
* two RACING writers both land (restage-on-race at the put-if-absent
  link) with disjoint dense ranges;
* the high-water mark never decreases: delete, rollback, clone.
"""

import threading

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    add_identity_column,
    clone_table,
    delete_where,
    drop_identity_column,
    identity_columns,
    merge_into,
    read_snapshot,
    replace_where,
    rollback,
    update_where,
    write_snapshot,
)


def _fresh(spark, t, cols="k long, v string"):
    write_snapshot(spark.createDataFrame([], cols), t)
    add_identity_column(t, "pk")


def _ids(spark, t):
    return sorted(r.pk for r in read_snapshot(spark, t).collect())


def test_append_assigns_dense_contiguous_ids(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    write_snapshot(
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(500)], "k long, v string"
        ).repartition(8),
        t,
        mode="append",
    )
    assert _ids(spark, t) == list(range(1, 501))
    write_snapshot(
        spark.createDataFrame([(i, "b") for i in range(50)], "k long, v string"),
        t,
        mode="append",
    )
    assert _ids(spark, t) == list(range(1, 551))
    assert identity_columns(t)["pk"]["high"] == 550
    # ids are 1:1 with rows, never recycled across batches
    assert read_snapshot(spark, t).select("pk").distinct().count() == 550


def test_custom_start_step(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([], "k long"), t)
    add_identity_column(t, "pk", start=100, step=10)
    write_snapshot(
        spark.createDataFrame([(i,) for i in range(5)], "k long"),
        t,
        mode="append",
    )
    assert _ids(spark, t) == [100, 110, 120, 130, 140]


def test_generated_always_refused_everywhere(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), t, mode="append"
    )
    with pytest.raises(ValueError, match="IDENTITY"):
        write_snapshot(
            spark.createDataFrame(
                [(2, "b", 99)], "k long, v string, pk long"
            ),
            t,
            mode="append",
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        merge_into(
            spark,
            t,
            spark.createDataFrame([(1, "x", 7)], "k long, v string, pk long"),
            keys=["k"],
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        merge_into(
            spark,
            t,
            spark.createDataFrame([(1, "x")], "k long, v string"),
            keys=["k"],
            when_matched={"pk": "v"},
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        update_where(spark, t, F.col("k") == 1, {"pk": 0})
    with pytest.raises(ValueError, match="IDENTITY"):
        replace_where(
            spark,
            t,
            F.col("k") == 1,
            spark.createDataFrame([(1, "y", 1)], "k long, v string, pk long"),
        )


def test_declare_on_nonempty_table_refused(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1,)], "k long"), t)
    with pytest.raises(ValueError, match="already has data"):
        add_identity_column(t, "pk")


def test_merge_inserts_mint_matched_keep(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    write_snapshot(
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(20)], "k long, v string"
        ).repartition(4),
        t,
        mode="append",
    )
    before = {r.k: r.pk for r in read_snapshot(spark, t).collect()}
    src = spark.createDataFrame(
        [(5, "UPD"), (7, "UPD"), (100, "NEW"), (101, "NEW")],
        "k long, v string",
    )
    merge_into(spark, t, src, keys=["k"])
    after = {r.k: (r.pk, r.v) for r in read_snapshot(spark, t).collect()}
    # matched rows: value updated, id UNCHANGED
    assert after[5] == (before[5], "UPD")
    assert after[7] == (before[7], "UPD")
    # inserts minted the next dense ids
    assert sorted([after[100][0], after[101][0]]) == [21, 22]
    assert _ids(spark, t) == list(range(1, 23))
    # delete-only / update-only merges mint nothing
    merge_into(
        spark,
        t,
        spark.createDataFrame([(3, "gone")], "k long, v string"),
        keys=["k"],
        delete_when=F.lit(True),
        insert=False,
    )
    assert identity_columns(t)["pk"]["high"] == 22


def test_two_writer_race_no_gaps_no_dups(spark, tmp_path):
    """Both racing appends land (restage-on-race): the union is dense
    1..n_total with each batch's ids contiguous within itself."""
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    errs = []

    def writer(tag, n):
        try:
            write_snapshot(
                spark.createDataFrame(
                    [(i, tag) for i in range(n)], "k long, v string"
                ),
                t,
                mode="append",
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [
        threading.Thread(target=writer, args=("w1", 40)),
        threading.Thread(target=writer, args=("w2", 25)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    rows = read_snapshot(spark, t).collect()
    assert sorted(r.pk for r in rows) == list(range(1, 66))
    # each writer's range is itself contiguous (assigned in one commit)
    for tag, n in (("w1", 40), ("w2", 25)):
        mine = sorted(r.pk for r in rows if r.v == tag)
        assert mine == list(range(mine[0], mine[0] + n))
    assert identity_columns(t)["pk"]["high"] == 65


def test_high_water_survives_delete_rollback_clone(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    write_snapshot(
        spark.createDataFrame([(i, "a") for i in range(10)], "k long, v string"),
        t,
        mode="append",
    )
    delete_where(spark, t, F.col("k") >= 5)
    assert identity_columns(t)["pk"]["high"] == 10
    write_snapshot(
        spark.createDataFrame([(99, "post")], "k long, v string"),
        t,
        mode="append",
    )
    assert 11 in _ids(spark, t)  # deleted ids 6-10 NOT recycled
    # rollback to the 10-row version: high stays at the latest mark
    rollback(t, 2)
    assert identity_columns(t)["pk"]["high"] == 11
    write_snapshot(
        spark.createDataFrame([(7, "after")], "k long, v string"),
        t,
        mode="append",
    )
    assert max(_ids(spark, t)) == 12
    # clone carries the sequence; the clone continues independently
    c = str(tmp_path / "clone")
    clone_table(t, c)
    assert identity_columns(c)["pk"]["high"] == 12
    write_snapshot(
        spark.createDataFrame([(1, "c")], "k long, v string"), c, mode="append"
    )
    assert max(_ids(spark, c)) == 13
    assert identity_columns(t)["pk"]["high"] == 12  # source unaffected


def test_drop_identity_reopens_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _fresh(spark, t)
    write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), t, mode="append"
    )
    drop_identity_column(t, "pk")
    assert identity_columns(t) == {}
    # now a plain column: suppliable again
    write_snapshot(
        spark.createDataFrame([(2, "b", 777)], "k long, v string, pk long"),
        t,
        mode="append",
    )
    assert sorted(r.pk for r in read_snapshot(spark, t).collect()) == [1, 777]
    with pytest.raises(ValueError, match="no IDENTITY"):
        drop_identity_column(t, "pk")


def _stat_fresh(spark, t, n=50):
    """Identity table with k-stats so the merge's disjointness proof
    (prune vs appended files' stats) has material to work with."""
    write_snapshot(spark.createDataFrame([], "k long, v string"), t)
    add_identity_column(t, "pk")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(1, n + 1)], "k long, v string"
        ).repartition(2),
        t,
        mode="append",
        stats_cols=["k"],
    )


def test_minting_merge_restages_over_disjoint_append(
    spark, tmp_path, monkeypatch
):
    """r9 (r8 sharp edge #2): a minting merge no longer conflicts on a
    provably-disjoint concurrent append — even though the append itself
    minted ids and advanced the mark, the merge RESTAGES its fresh
    segment from the new high (no merge re-run: candidate scan runs
    exactly once) and both commits land with dense, non-overlapping
    ids. Covers the MoR (dv) path."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _stat_fresh(spark, t, n=50)  # ids 1..50, keys 1..50

    real_scan = V._dv_candidate_scan
    scans = []

    def hook(*a, **kw):
        scans.append(1)
        if len(scans) == 1:
            # a disjoint concurrent append (key 900 is not a source
            # key — point-membership proof) that MINTS pk=51
            write_snapshot(
                spark.createDataFrame([(900, "app")], "k long, v string"),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return real_scan(*a, **kw)

    monkeypatch.setattr(V, "_dv_candidate_scan", hook)
    merge_into(
        spark,
        t,
        spark.createDataFrame([(1, "upd"), (60, "i60")], "k long, v string"),
        keys=["k"],
        strategy="dv",
    )
    rows = {r.k: r for r in read_snapshot(spark, t).collect()}
    assert len(scans) == 1  # the merge ran ONCE — restage, not re-run
    assert rows[900].pk == 51  # append's minted id kept
    assert rows[60].pk == 52  # merge insert re-minted PAST the append
    assert rows[1].v == "upd"
    assert identity_columns(t)["pk"]["high"] == 52
    assert sorted(r.pk for r in rows.values()) == list(range(1, 53))


def test_minting_merge_restage_shifts_insert_ids(
    spark, tmp_path, monkeypatch
):
    """The restaged insert mints AFTER the concurrent append's range:
    ids stay dense 1..n with the append's row keeping its id."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _stat_fresh(spark, t, n=50)

    real_scan = V._dv_candidate_scan
    fired = {}

    def hook(*a, **kw):
        if not fired:
            fired["x"] = True
            write_snapshot(
                spark.createDataFrame(
                    [(900, "app1"), (901, "app2")], "k long, v string"
                ),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return real_scan(*a, **kw)

    monkeypatch.setattr(V, "_dv_candidate_scan", hook)
    merge_into(
        spark,
        t,
        spark.createDataFrame(
            [(1, "u1"), (60, "i60"), (61, "i61")], "k long, v string"
        ),
        keys=["k"],
        strategy="dv",
    )
    rows = {r.k: r for r in read_snapshot(spark, t).collect()}
    assert {rows[900].pk, rows[901].pk} == {51, 52}
    assert {rows[60].pk, rows[61].pk} == {53, 54}
    assert identity_columns(t)["pk"]["high"] == 54
    assert sorted(r.pk for r in rows.values()) == list(range(1, 55))


def test_minting_merge_cow_restages_too(spark, tmp_path, monkeypatch):
    """Same contract on the CoW path: _rewrite_segment is called twice
    (stage + restage) and the merge itself never re-runs."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _stat_fresh(spark, t, n=50)

    real_rw = V._rewrite_segment
    calls = []

    def hook(*a, **kw):
        calls.append(1)
        if len(calls) == 1:
            write_snapshot(
                spark.createDataFrame([(900, "app")], "k long, v string"),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return real_rw(*a, **kw)

    monkeypatch.setattr(V, "_rewrite_segment", hook)
    merge_into(
        spark,
        t,
        spark.createDataFrame(
            [(1, "u1"), (70, "i70")], "k long, v string"
        ),
        keys=["k"],
        strategy="cow",
    )
    rows = {r.k: r for r in read_snapshot(spark, t).collect()}
    assert len(calls) == 2  # stage + restage, no third pass
    assert rows[900].pk == 51 and rows[70].pk == 52
    assert rows[1].v == "u1"
    assert sorted(r.pk for r in rows.values()) == list(range(1, 53))


def test_minting_merge_overlapping_append_still_conflicts(
    spark, tmp_path, monkeypatch
):
    """An append whose file may CONTAIN a source key is unprovable —
    the merge must still raise CommitConflict (its matched-row scan and
    insert anti-join are stale), minting or not. Key 60 IS the merge's
    insert key, so the point-membership proof rightly fails."""
    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.sources.versioned import CommitConflict

    t = str(tmp_path / "tbl")
    _stat_fresh(spark, t, n=50)

    real_scan = V._dv_candidate_scan
    fired = {}

    def hook(*a, **kw):
        if not fired:
            fired["x"] = True
            write_snapshot(
                spark.createDataFrame([(60, "race")], "k long, v string"),
                t,
                mode="append",
                stats_cols=["k"],
            )
        return real_scan(*a, **kw)

    monkeypatch.setattr(V, "_dv_candidate_scan", hook)
    with pytest.raises(CommitConflict):
        merge_into(
            spark,
            t,
            spark.createDataFrame(
                [(1, "u1"), (60, "i60")], "k long, v string"
            ),
            keys=["k"],
            strategy="dv",
        )
