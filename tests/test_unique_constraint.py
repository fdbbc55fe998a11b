"""Enforced UNIQUE constraints on versioned tables
(sources/versioned.py): the primary-key guarantee lakehouse formats
document but don't enforce. Appends probe their keys against the table
with stats/bloom file pruning; rewrites re-check only when they can
alter key columns; racing writers stay serializable via delta re-probes
at the put-if-absent link."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    CommitConflict,
    UniqueConstraintViolation,
    add_unique_constraint,
    drop_unique_constraint,
    latest_version,
    merge_into,
    read_snapshot,
    unique_constraints,
    update_where,
    write_snapshot,
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _base(spark, t, **kw):
    write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(8)], "k long, v string"),
        t,
        **kw,
    )


def test_add_validates_snapshot_and_inputs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string"), t
    )
    with pytest.raises(ValueError, match="existing data"):
        add_unique_constraint(spark, t, "pk", ["k"])
    with pytest.raises(ValueError, match="unknown"):
        add_unique_constraint(spark, t, "pk", ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        add_unique_constraint(spark, t, "pk", [])
    # composite key (k, v) IS unique here
    add_unique_constraint(spark, t, "pk", ["k", "v"])
    assert unique_constraints(t) == {"pk": ["k", "v"]}
    with pytest.raises(ValueError, match="already exists"):
        add_unique_constraint(spark, t, "pk", ["k"])


def test_append_gated_within_batch_and_against_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    v = latest_version(t)
    # duplicate keys WITHIN the batch
    with pytest.raises(UniqueConstraintViolation, match="within the batch"):
        write_snapshot(
            spark.createDataFrame([(100, "x"), (100, "y")], "k long, v string"),
            t,
            mode="append",
        )
    # key already present in the table
    with pytest.raises(UniqueConstraintViolation, match="already present"):
        write_snapshot(
            spark.createDataFrame([(3, "dup")], "k long, v string"),
            t,
            mode="append",
        )
    assert latest_version(t) == v  # nothing committed
    # NULL keys never conflict (SQL UNIQUE), clean keys land
    write_snapshot(
        spark.createDataFrame(
            [(None, "n1"), (None, "n2"), (100, "x")], "k long, v string"
        ),
        t,
        mode="append",
    )
    assert read_snapshot(spark, t).count() == 11
    # overwrite replaces the table: only internal dups matter
    write_snapshot(
        spark.createDataFrame([(3, "fresh")], "k long, v string"), t
    )
    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame([(5, "a"), (5, "b")], "k long, v string"), t
        )


def test_probe_prunes_with_stats_and_blooms(spark, tmp_path):
    """The existence probe point-prunes candidate files via the same
    manifest stats/blooms as point_filter reads — correctness sweep: no
    false accept for present keys, no false reject for absent ones."""
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(0, 4000, 2)], "k long, v string"
        ).repartition(8),
        t,
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    add_unique_constraint(spark, t, "pk", ["k"])
    # absent (odd) keys append fine
    write_snapshot(
        spark.createDataFrame([(i, "new") for i in range(1, 100, 2)], "k long, v string"),
        t,
        mode="append",
    )
    # one present key among many absent ones is still caught
    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame(
                [(4001, "a"), (4003, "b"), (1234, "dup")], "k long, v string"
            ),
            t,
            mode="append",
        )


def test_rewrites_gated_only_when_keys_can_change(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    v = latest_version(t)
    # updating the key column INTO an existing key is refused
    with pytest.raises(UniqueConstraintViolation, match="carried file|replacement"):
        update_where(spark, t, F.col("k") == 1, {"k": F.lit(3)})
    assert latest_version(t) == v
    # updating a non-key column is exempt from the probe and works
    update_where(spark, t, F.col("k") == 1, {"v": F.lit("patched")})
    # merge keyed on the unique column upserts cleanly
    merge_into(
        spark,
        t,
        spark.createDataFrame([(3, "m"), (200, "new")], "k long, v string"),
        ["k"],
    )
    got = dict(_rows(read_snapshot(spark, t)))
    assert got[1] == "patched" and got[3] == "m" and got[200] == "new"
    # merge keyed on ANOTHER column that inserts a duplicate unique key
    # is refused
    with pytest.raises(UniqueConstraintViolation):
        merge_into(
            spark,
            t,
            spark.createDataFrame([(3, "zzz")], "k long, v string"),
            ["v"],
            prune=None,
        )


def test_racing_appends_stay_serializable(spark, tmp_path, monkeypatch):
    """Two appends, each clean against the base, both inserting key 42:
    the race loser's put-if-absent link fails, it re-probes exactly the
    winner's delta, and refuses — no duplicate ever commits."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    real_try = V._try_commit
    state = {"injected": False}

    def hooked(table, version, manifest):
        if not state["injected"] and table == t:
            state["injected"] = True
            write_snapshot(
                spark.createDataFrame([(42, "winner")], "k long, v string"),
                t,
                mode="append",
            )
        return real_try(table, version, manifest)

    monkeypatch.setattr(V, "_try_commit", hooked)
    with pytest.raises(UniqueConstraintViolation, match="already present"):
        write_snapshot(
            spark.createDataFrame([(42, "loser")], "k long, v string"),
            t,
            mode="append",
        )
    vals = [v for k, v in _rows(read_snapshot(spark, t)) if k == 42]
    assert vals == ["winner"]


def test_unique_disables_rewrite_rebase(spark, tmp_path, monkeypatch):
    """With a UNIQUE constraint, a rewrite racing a concurrent append is
    a strict conflict (the append was never probed against the
    replacement rows) — even an append that would otherwise commute."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    real = V._rewrite_segment
    state = {"done": False}

    def hooked(*a, **k):
        if not state["done"]:
            state["done"] = True
            write_snapshot(
                spark.createDataFrame([(500, "late")], "k long, v string"),
                t,
                mode="append",
            )
        return real(*a, **k)

    monkeypatch.setattr(V, "_rewrite_segment", hooked)
    with pytest.raises(CommitConflict):
        update_where(spark, t, F.col("k") == 1, {"k": F.lit(900)})


def test_survives_maintenance_and_drop_reopens(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import compact, rollback

    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    v = latest_version(t)
    write_snapshot(
        spark.createDataFrame([(100, "x")], "k long, v string"),
        t,
        mode="append",
    )
    compact(spark, t, target_files=1)
    assert unique_constraints(t) == {"pk": ["k"]}
    rollback(t, v)
    assert unique_constraints(t) == {"pk": ["k"]}
    drop_unique_constraint(t, "pk")
    assert unique_constraints(t) == {}
    write_snapshot(
        spark.createDataFrame([(3, "dup")], "k long, v string"),
        t,
        mode="append",
    )  # no longer gated
    with pytest.raises(ValueError, match="no unique constraint"):
        drop_unique_constraint(t, "nope")


def test_datasource_append_gated_by_unique(spark, tmp_path):
    """The format writer's sandboxed commit verifies UNIQUE over the
    staged files with DuckDB — the pointer never moves on violation."""
    from wrtd_etl_spark.sources.versioned_table import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_unique_constraint(spark, t, "pk", ["k"])
    v = latest_version(t)
    bad = spark.createDataFrame([(3, "dup")], "k long, v string")
    with pytest.raises(Exception, match="UNIQUE|already present"):
        bad.write.format("versioned_table").mode("append").option(
            "path", t
        ).save()
    assert latest_version(t) == v
    ok = spark.createDataFrame([(300, "fresh")], "k long, v string")
    ok.write.format("versioned_table").mode("append").option("path", t).save()
    assert read_snapshot(spark, t).count() == 9


def test_rename_refused_under_check_and_unique_layout_follows(
    spark, tmp_path
):
    """A raw-SQL CHECK cannot be rewritten and a UNIQUE probe cannot
    span physical names mid-commit — renames of referenced columns are
    refused; the clustered layout is a plain column list and follows."""
    from wrtd_etl_spark.sources.versioned import (
        add_check_constraint,
        drop_check_constraint,
        manifest_info,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(8)], "k long, v long"
        ),
        t,
        layout_by=["k"],
        layout_files=2,
    )
    add_check_constraint(spark, t, "v_pos", "v >= 0")
    nxt = spark.createDataFrame([(100, 5)], "k long, val long")
    with pytest.raises(ValueError, match="CHECK"):
        write_snapshot(nxt, t, mode="append", renames={"v": "val"})
    drop_check_constraint(t, "v_pos")
    add_unique_constraint(spark, t, "uv", ["v"])
    with pytest.raises(ValueError, match="UNIQUE"):
        write_snapshot(nxt, t, mode="append", renames={"v": "val"})
    drop_unique_constraint(t, "uv")
    # renaming the layout column carries the spec under the new name
    write_snapshot(
        spark.createDataFrame([(100, 5)], "key long, v long"),
        t,
        mode="append",
        renames={"k": "key"},
    )
    assert manifest_info(t)["layout"]["by"] == ["key"]
    from wrtd_etl_spark.sources.versioned import compact, files_for_read

    compact(spark, t)  # re-clusters on the renamed column, no crash
    kept, total = files_for_read(t, skip_filter={"key": (0, 1)})
    assert total >= 2 and len(kept) < total


def test_evolved_probe_stays_point_pruned(spark, tmp_path, monkeypatch):
    """r8: on a schema-EVOLVED table (a non-key rename forces the
    schema-aware probe path) the existence probe still point-prunes to
    candidate files via the alias-aware stat/bloom lookup — no compact
    required. Pinned by a spy: the probe's snapshot read receives the
    staged batch's point_filter, and that filter prunes the file list."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(0, 4000, 2)], "k long, v string"
        ).repartition(8),
        t,
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    add_unique_constraint(spark, t, "pk", ["k"])
    # rename a NON-key column (key renames are refused by design):
    # the table is now schema_evolved and the probe must go through the
    # schema-aware reader
    write_snapshot(
        spark.createDataFrame([(10001, "x")], "k long, val string"),
        t,
        mode="append",
        renames={"v": "val"},
    )
    assert V._read_manifest_root(t, V._read_pointer(t))["schema_evolved"]

    seen = {}
    real = V.read_snapshot

    def spy(spark_, table_, version=None, **kw):
        if table_ == t:
            seen["point_filter"] = kw.get("point_filter")
            seen["version"] = version
        return real(spark_, table_, version=version, **kw)

    monkeypatch.setattr(V, "read_snapshot", spy)
    # clean batch: passes, and the probe was point-pruned
    write_snapshot(
        spark.createDataFrame([(1, "n"), (3, "n")], "k long, val string"),
        t,
        mode="append",
    )
    assert seen.get("point_filter") == {"k": [1, 3]}
    cand, total = V.files_for_read(
        t, version=seen["version"], point_filter=seen["point_filter"]
    )
    assert total >= 8 and len(cand) < total  # candidates only, not all
    # a present key is still caught through the pruned evolved probe
    seen.clear()
    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame([(1234, "dup")], "k long, val string"),
            t,
            mode="append",
        )
    assert seen.get("point_filter") == {"k": [1234]}
