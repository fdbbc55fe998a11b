"""Versioned table format (sources/versioned.py): time travel, atomic
commit, non-destructive rollback, vacuum retention."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    history,
    latest_version,
    read_snapshot,
    rollback,
    vacuum,
    write_snapshot,
)


def _vals(df):
    return sorted(r.v for r in df.collect())


def test_time_travel_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t) == 0
    assert (
        write_snapshot(
            spark.range(10, 12).withColumnRenamed("id", "v"), t, mode="append"
        )
        == 1
    )
    assert (
        write_snapshot(spark.range(5).withColumnRenamed("id", "v"), t) == 2
    )
    assert _vals(read_snapshot(spark, t, version=0)) == [0, 1, 2]
    assert _vals(read_snapshot(spark, t, version=1)) == [0, 1, 2, 10, 11]
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2, 3, 4]
    h = history(t)
    assert [e["version"] for e in h] == [2, 1, 0]
    assert h[1]["mode"] == "append" and h[1]["parent"] == 0


def test_crash_before_manifest_link_preserves_previous_version(spark, tmp_path):
    """Simulated torn write under the link-commit protocol: the crashed
    writer left data files and a STAGED (tmp) manifest, but never linked
    v1.json — readers must still see v0, and the next commit takes v1."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    # fake the crashed writer: orphan data dir + staged-but-unlinked manifest
    orphan = os.path.join(t, "data", "deadbeef")
    os.makedirs(orphan)
    spark.range(100, 103).withColumnRenamed("id", "v").write.parquet(
        orphan, mode="overwrite"
    )
    with open(os.path.join(t, "_manifests", "v1.json.dead.tmp"), "w") as f:
        json.dump({"version": 1, "files": []}, f)
    assert latest_version(t) == 0
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    # and the NEXT real commit takes v1 cleanly
    v = write_snapshot(spark.range(7, 9).withColumnRenamed("id", "v"), t)
    assert v == 1
    assert _vals(read_snapshot(spark, t)) == [7, 8]


def test_committed_manifest_visible_without_pointer_update(spark, tmp_path):
    """The manifest LINK is the commit point: a crash after the link but
    before the pointer-cache update must not hide the version — readers
    probe forward from the cache."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    write_snapshot(spark.range(5, 7).withColumnRenamed("id", "v"), t)
    # simulate the crash: regress the pointer cache to v0
    with open(os.path.join(t, "_latest"), "w") as f:
        f.write("0")
    assert latest_version(t) == 1
    assert _vals(read_snapshot(spark, t)) == [5, 6]
    # and a missing cache entirely is also survivable
    os.remove(os.path.join(t, "_latest"))
    assert latest_version(t) == 1
    v = write_snapshot(spark.range(9, 10).withColumnRenamed("id", "v"), t)
    assert v == 2


def test_rollback_is_non_destructive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    write_snapshot(spark.range(50, 52).withColumnRenamed("id", "v"), t)
    v = rollback(t, 0)
    assert v == 2
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    # the rolled-over version is still readable (history intact)
    assert _vals(read_snapshot(spark, t, version=1)) == [50, 51]
    assert history(t)[0]["mode"] == "rollback:0"


def test_vacuum_keeps_referenced_files_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    write_snapshot(spark.range(10, 13).withColumnRenamed("id", "v"), t)
    rollback(t, 0)  # latest (v2) references v0's files
    # the age guard keeps YOUNG unreferenced files (they may belong to an
    # in-flight commit that has not linked its manifest yet) ...
    assert vacuum(t, keep_last=1) == []
    assert _vals(read_snapshot(spark, t, version=1)) == [10, 11, 12]
    # ... tmp_age_s=0 waives it (no concurrent writers in this test)
    deleted = vacuum(t, keep_last=1, tmp_age_s=0.0)
    assert deleted, "v1's exclusive files should have been deleted"
    # latest still fully readable because rollback shares v0's files
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]
    with pytest.raises(Exception):
        read_snapshot(spark, t, version=1).collect()
    # keep_last=2 on a fresh table deletes nothing
    t2 = str(tmp_path / "tbl2")
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    assert vacuum(t2, keep_last=2) == []


def test_compact_preserves_rows_and_history(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import compact, data_file_count

    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        write_snapshot(
            spark.range(lo, lo + 5).repartition(4).withColumnRenamed("id", "v"),
            t,
            mode="append" if lo else "overwrite",
        )
    before = data_file_count(t)
    assert before >= 12  # 3 appends x 4 files
    v = compact(spark, t, target_files=1)
    assert v == 3
    assert data_file_count(t) == 1
    assert _vals(read_snapshot(spark, t)) == list(range(5)) + list(
        range(10, 15)
    ) + list(range(20, 25))
    # pre-compaction version still time-travels with the OLD layout
    assert data_file_count(t, version=2) == before
    assert _vals(read_snapshot(spark, t, version=2)) == _vals(
        read_snapshot(spark, t)
    )
    assert history(t)[0]["mode"] == "compact"
    # retention: vacuum drops the small files, compacted table unharmed
    deleted = vacuum(t, keep_last=1, tmp_age_s=0.0)
    assert len(deleted) == before
    assert len(_vals(read_snapshot(spark, t))) == 15


def test_append_schema_evolution_merges_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    import pyspark.sql.functions as F

    write_snapshot(
        spark.range(10, 12)
        .withColumnRenamed("id", "v")
        .withColumn("extra", F.lit("x")),
        t,
        mode="append",
    )
    got = read_snapshot(spark, t)
    assert set(got.columns) == {"v", "extra"}
    rows = {r.v: r.extra for r in got.collect()}
    assert rows[10] == "x" and rows[0] is None  # old rows NULL-fill
    # non-evolved tables never pay the mergeSchema footer pass
    t2 = str(tmp_path / "tbl2")
    write_snapshot(spark.range(2).withColumnRenamed("id", "v"), t2)
    write_snapshot(
        spark.range(2).withColumnRenamed("id", "v"), t2, mode="append"
    )
    import json as _json
    import os as _os

    with open(_os.path.join(t2, "_manifests", "v1.json")) as f:
        assert _json.load(f)["schema_evolved"] is False


def test_rollback_carries_schema_evolution_and_extra(spark, tmp_path):
    """Restoring an append-evolved version must keep mergeSchema on (or
    the evolved columns silently vanish) and carry the target's extra
    metadata; a later append must inherit evolved=True."""
    from wrtd_etl_spark.sources.versioned import manifest_info

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "v long, s string"),
        t,
        extra={"tag": "base"},
    )
    write_snapshot(
        spark.createDataFrame([(2, "b", 9.5)], "v long, s string, x double"),
        t,
        mode="append",
        extra={"tag": "evolved"},
    )
    assert manifest_info(t)["schema_evolved"] is True
    # v2: plain overwrite drops back to a narrow schema
    write_snapshot(spark.createDataFrame([(3, "c")], "v long, s string"), t)
    v = rollback(t, 1)
    info = manifest_info(t, v)
    assert info["schema_evolved"] is True
    assert info["extra"] == {"tag": "evolved"}  # consumers index into it
    assert set(read_snapshot(spark, t).columns) == {"v", "s", "x"}
    assert {r.v for r in read_snapshot(spark, t).collect()} == {1, 2}
    # append on top of the restore inherits the evolved flag
    write_snapshot(
        spark.createDataFrame([(4, "d")], "v long, s string"), t, mode="append"
    )
    assert manifest_info(t)["schema_evolved"] is True
    assert "x" in read_snapshot(spark, t).columns


def test_concurrent_appends_both_survive(spark, tmp_path):
    """Put-if-absent commit: two appends racing for the same version get
    exactly one winner per slot; the loser REBASES carrying the winner's
    segments, so both row sets land (serializable append) and no
    manifest mixes in-flight files."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(0, 3).withColumnRenamed("id", "v"), t)

    def appender(lo):
        return write_snapshot(
            spark.range(lo, lo + 3).withColumnRenamed("id", "v"),
            t,
            mode="append",
        )

    with ThreadPoolExecutor(2) as ex:
        versions = sorted(ex.map(appender, [100, 200]))
    assert versions == [1, 2]
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2, 100, 101, 102, 200, 201, 202]
    # every manifest's file list is internally consistent (subset growth)
    from wrtd_etl_spark.sources.versioned import data_file_count

    assert data_file_count(t, 0) < data_file_count(t, 1) < data_file_count(t, 2)
    # vacuum reclaims nothing while all manifests are retained
    assert vacuum(t, keep_last=3) == []


def test_data_skipping_prunes_zordered_files(spark, tmp_path):
    """Manifest min/max stats + skip_filter: a Z-order-clustered table
    with a 2-D range predicate must hand Spark < 1/3 of the files, with
    results identical to the unpruned read (VERDICT r3 ask #2 — this is
    what makes operators/zorder.py pay off end-to-end)."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.operators.zorder import zorder_key
    from wrtd_etl_spark.sources.versioned import files_for_read

    from .conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    lo_hi = orders.agg(
        F.min("o_custkey").cast("double").alias("lo1"),
        F.max("o_custkey").cast("double").alias("hi1"),
        F.min("o_totalprice").alias("lo2"),
        F.max("o_totalprice").alias("hi2"),
    ).collect()[0]
    z = zorder_key(
        [F.col("o_custkey"), F.col("o_totalprice")],
        [(lo_hi["lo1"], lo_hi["hi1"]), (lo_hi["lo2"], lo_hi["hi2"])],
    )
    laid_out = (
        orders.withColumn("__z", z)
        .repartitionByRange(16, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    t = str(tmp_path / "orders_z")
    write_snapshot(
        laid_out, t, stats_cols=["o_custkey", "o_totalprice"]
    )
    ck_hi = int(lo_hi["hi1"] // 8)
    tp_hi = lo_hi["lo2"] + (lo_hi["hi2"] - lo_hi["lo2"]) / 8
    skip = {"o_custkey": (None, ck_hi), "o_totalprice": (None, tp_hi)}
    kept, total = files_for_read(t, skip_filter=skip)
    assert total >= 12
    assert len(kept) < total / 3, (len(kept), total)
    pred = (F.col("o_custkey") <= ck_hi) & (F.col("o_totalprice") <= tp_hi)
    pruned = sorted(
        r.o_orderkey
        for r in read_snapshot(spark, t, skip_filter=skip).filter(pred).collect()
    )
    full = sorted(
        r.o_orderkey for r in read_snapshot(spark, t).filter(pred).collect()
    )
    assert pruned == full and len(full) > 0
    # unfiltered read path is unchanged: every file, same rows
    assert read_snapshot(spark, t).count() == orders.count()


def test_append_type_widening(spark, tmp_path):
    """int→long / float→double appends widen losslessly at read; old
    snapshots still time-travel with their original types."""
    from wrtd_etl_spark.sources.versioned import manifest_info

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, 1.5)], "v int, x float"), t
    )
    write_snapshot(
        spark.createDataFrame([(2**40, 2.5)], "v long, x double"),
        t,
        mode="append",
    )
    got = read_snapshot(spark, t)
    assert dict(got.dtypes) == {"v": "bigint", "x": "double"}
    assert sorted((r.v, round(r.x, 1)) for r in got.collect()) == [
        (1, 1.5),
        (2**40, 2.5),
    ]
    # time travel reads v0 with its ORIGINAL narrow types
    v0 = read_snapshot(spark, t, version=0)
    assert dict(v0.dtypes) == {"v": "int", "x": "float"}
    assert manifest_info(t)["schema_evolved"] is True
    # narrowing / incompatible changes refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible type change"):
        write_snapshot(
            spark.createDataFrame([("oops", 1.0)], "v string, x double"),
            t,
            mode="append",
        )


def test_append_rename_mapping(spark, tmp_path):
    """A declared rename re-labels older segments at read time; chains
    compose; time travel keeps the historical name."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1, 10)], "k long, amt int"), t)
    write_snapshot(
        spark.createDataFrame([(2, 20)], "k long, amount int"),
        t,
        mode="append",
        renames={"amt": "amount"},
    )
    got = read_snapshot(spark, t)
    assert set(got.columns) == {"k", "amount"}
    assert {(r.k, r.amount) for r in got.collect()} == {(1, 10), (2, 20)}
    # chain a second rename and also widen the type
    write_snapshot(
        spark.createDataFrame([(3, 2**40)], "k long, total long"),
        t,
        mode="append",
        renames={"amount": "total"},
    )
    got = read_snapshot(spark, t)
    assert dict(got.dtypes)["total"] == "bigint"
    assert {(r.k, r.total) for r in got.collect()} == {
        (1, 10),
        (2, 20),
        (3, 2**40),
    }
    # time travel: v0 still has the original name and type
    assert dict(read_snapshot(spark, t, version=0).dtypes) == {
        "k": "bigint",
        "amt": "int",
    }
    # renaming an unknown column refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown column"):
        write_snapshot(
            spark.createDataFrame([(4, 1)], "k long, zz int"),
            t,
            mode="append",
            renames={"nope": "zz"},
        )


def test_compact_inherits_stats_surface(spark, tmp_path):
    """Compaction must not silently turn off data skipping: the rewrite
    re-records min/max for every column the appends had stats for."""
    from wrtd_etl_spark.sources.versioned import compact, files_for_read

    t = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        write_snapshot(
            spark.range(lo, lo + 50).withColumnRenamed("id", "v"),
            t,
            mode="append" if lo else "overwrite",
            stats_cols=["v"],
        )
    kept, total = files_for_read(t, skip_filter={"v": (0, 10)})
    assert len(kept) < total  # appends recorded usable stats
    compact(spark, t, target_files=4)
    kept2, total2 = files_for_read(t, skip_filter={"v": (250, None)})
    assert total2 == 4
    assert len(kept2) < total2, "compacted files lost their stats"
    got = sorted(
        r.v
        for r in read_snapshot(spark, t, skip_filter={"v": (250, None)})
        .filter(F.col("v") >= 250)
        .collect()
    )
    assert got == []
    got = sorted(
        r.v
        for r in read_snapshot(spark, t, skip_filter={"v": (240, None)})
        .filter(F.col("v") >= 240)
        .collect()
    )
    assert got == list(range(240, 250))


def test_vacuum_sweeps_staged_tmp_debris(spark, tmp_path):
    """Crashed / race-losing commits leave staged .tmp manifests and
    pointer tmps; vacuum removes them without touching live state."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    with open(os.path.join(t, "_manifests", "v1.json.x.tmp"), "w") as f:
        f.write("{}")
    with open(os.path.join(t, "_latest.y.tmp"), "w") as f:
        f.write("9")
    # fresh tmps survive the default age threshold (an in-flight writer's
    # staged manifest must never be swept from under its os.link)
    vacuum(t)
    assert [
        f for f in os.listdir(os.path.join(t, "_manifests")) if f.endswith(".tmp")
    ]
    vacuum(t, tmp_age_s=0.0)
    assert not [
        f for f in os.listdir(os.path.join(t, "_manifests")) if f.endswith(".tmp")
    ]
    assert not [f for f in os.listdir(t) if f.endswith(".tmp")]
    assert latest_version(t) == 0
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2]


def test_layout_by_clusters_and_records_stats(spark, tmp_path):
    """write_snapshot(layout_by=...) = Z-order layout + stats + skipping
    in one call: a range predicate on either layout column prunes files,
    results equal the unpruned read."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.sources.versioned import files_for_read

    from .conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    t = str(tmp_path / "orders_z")
    write_snapshot(
        orders,
        t,
        layout_by=["o_custkey", "o_totalprice"],
        layout_files=16,
    )
    hi = orders.agg(F.max("o_custkey")).collect()[0][0] // 8
    kept, total = files_for_read(t, skip_filter={"o_custkey": (None, hi)})
    assert total == 16 and len(kept) < total / 2
    pred = F.col("o_custkey") <= hi
    assert sorted(
        r.o_orderkey
        for r in read_snapshot(spark, t, skip_filter={"o_custkey": (None, hi)})
        .filter(pred)
        .collect()
    ) == sorted(r.o_orderkey for r in orders.filter(pred).collect())


def test_table_changes_append_fast_path_and_rewrite_fallback(spark, tmp_path):
    """CDF: append ranges yield ONLY the appended rows as inserts (read
    from the delta files alone — history is deleted to prove it); an
    overwrite falls back to the symmetric diff with correct inserts and
    deletes."""
    import glob

    from wrtd_etl_spark.sources.versioned import table_changes

    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(0, 3).withColumnRenamed("id", "v"), t)
    v0_files = glob.glob(os.path.join(t, "data", "*", "*.parquet"))
    write_snapshot(
        spark.range(10, 12).withColumnRenamed("id", "v"), t, mode="append"
    )
    for f in v0_files:  # history gone: the fast path must not need it
        os.remove(f)
    ch = table_changes(spark, t, 0, 1).collect()
    assert sorted((r.v, r._change_type) for r in ch) == [
        (10, "insert"),
        (11, "insert"),
    ]
    # rewrite fallback on a separate, intact table: v0 = {0,1,2,2},
    # v1 overwrite = {1,2,7} -> inserts {7}, deletes {0, one 2} (EXCEPT
    # ALL respects multiplicity)
    t2 = str(tmp_path / "tbl2")
    write_snapshot(
        spark.createDataFrame([(0,), (1,), (2,), (2,)], "v long"), t2
    )
    write_snapshot(
        spark.createDataFrame([(1,), (2,), (7,)], "v long"), t2
    )
    ch = table_changes(spark, t2, 0, 1).collect()
    assert sorted((r.v, r._change_type) for r in ch) == [
        (0, "delete"),
        (2, "delete"),
        (7, "insert"),
    ]


def test_delete_where_copy_on_write_prunes_untouched_files(spark, tmp_path):
    """Stats-pruned DELETE: only files that might contain matches are
    rewritten; the rest carry forward by reference. Time travel keeps
    the pre-delete rows; NULL-predicate rows survive (SQL semantics)."""
    from wrtd_etl_spark.sources.versioned import delete_where, history

    t = str(tmp_path / "tbl")
    df = spark.range(0, 1600).withColumnRenamed("id", "v").withColumn(
        "g", F.when(F.col("v") % 400 == 17, None).otherwise(F.col("v") % 7)
    )
    write_snapshot(df, t, layout_by=["v"], layout_files=16)
    from wrtd_etl_spark.sources.versioned import _read_manifest

    files_before = set(_read_manifest(t, 0)["files"])
    v = delete_where(
        spark,
        t,
        (F.col("v") >= 100) & (F.col("v") < 200),
        prune={"v": (100, 199)},
    )
    assert v == 1 and history(t)[0]["mode"] == "delete"
    got = _vals(read_snapshot(spark, t))
    assert got == list(range(0, 100)) + list(range(200, 1600))
    # untouched files carried forward by reference, not rewritten
    carried = set(_read_manifest(t, 1)["files"]) & files_before
    assert len(carried) >= 12, "most files should carry forward untouched"
    # time travel still sees the deleted rows
    assert len(_vals(read_snapshot(spark, t, version=0))) == 1600
    # NULL-predicate rows are kept: delete on g drops only g=3, not g NULL
    v = delete_where(spark, t, F.col("g") == 3)
    vals = read_snapshot(spark, t).collect()
    assert all(r.g != 3 for r in vals if r.g is not None)
    assert any(r.g is None for r in vals)
    # and a skip_filter read on the layout column still works post-delete
    kept, total = __import__(
        "wrtd_etl_spark.sources.versioned", fromlist=["files_for_read"]
    ).files_for_read(t, skip_filter={"v": (None, 50)})
    assert len(kept) < total


def test_streaming_versioned_append_exactly_once(spark, tmp_path):
    """Plain streaming ingestion into a versioned table: one append
    version per micro-batch, replays are no-ops, stats recorded."""
    from wrtd_etl_spark.sources.versioned import files_for_read, history
    from wrtd_etl_spark.streaming.versioned_sink import (
        make_versioned_append_sink,
        run_versioned_append_stream,
    )

    src = str(tmp_path / "src")
    for lo in (0, 100):  # two files -> two micro-batches
        spark.range(lo, lo + 50).withColumnRenamed("id", "v").coalesce(
            1
        ).write.mode("append").parquet(src)
    t = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    run_versioned_append_stream(
        stream, t, str(tmp_path / "ckpt"), stats_cols=["v"]
    )
    assert len(history(t)) == 2
    assert _vals(read_snapshot(spark, t)) == list(range(50)) + list(
        range(100, 150)
    )
    # replayed delivery of the LAST batch is a no-op
    sink = make_versioned_append_sink(t)
    last_batch = spark.range(100, 150).withColumnRenamed("id", "v")
    sink(last_batch, 1)
    assert len(history(t)) == 2
    # stats landed: a range read prunes
    kept, total = files_for_read(t, skip_filter={"v": (None, 10)})
    assert len(kept) < total


def test_compact_preserves_extra_ledger(spark, tmp_path):
    """compact() must carry the manifest extra forward: it is the
    exactly-once batch-id ledger for streaming sinks — wiping it would
    let a replayed micro-batch double-ingest after maintenance."""
    from wrtd_etl_spark.sources.versioned import compact, manifest_info
    from wrtd_etl_spark.streaming.versioned_sink import (
        make_versioned_append_sink,
    )

    t = str(tmp_path / "tbl")
    sink = make_versioned_append_sink(t)
    sink(spark.range(3).withColumnRenamed("id", "v"), 0)
    sink(spark.range(10, 12).withColumnRenamed("id", "v"), 1)
    compact(spark, t, target_files=1)
    assert manifest_info(t)["extra"] == {"batch_id": 1}
    sink(spark.range(10, 12).withColumnRenamed("id", "v"), 1)  # replay
    assert _vals(read_snapshot(spark, t)) == [0, 1, 2, 10, 11]


def test_renamed_away_column_cannot_be_reborn(spark, tmp_path):
    """Reintroducing a historical column name would make the table-level
    alias map silently re-label the new column — refuse at write time."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1, 10)], "k long, amt int"), t)
    write_snapshot(
        spark.createDataFrame([(2, 20)], "k long, amount int"),
        t,
        mode="append",
        renames={"amt": "amount"},
    )
    with pytest.raises(ValueError, match="reintroduced"):
        write_snapshot(
            spark.createDataFrame([(3, 30, 1)], "k long, amount int, amt int"),
            t,
            mode="append",
        )


def test_skip_filter_accepts_date_bounds(spark, tmp_path):
    """Date/timestamp skip_filter bounds compare through the same JSON
    encoding as the stored stats (isoformat — order-preserving) instead
    of raising TypeError."""
    import datetime as dt

    from wrtd_etl_spark.sources.versioned import files_for_read

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, dt.date(2026, 1, 1 + i)) for i in range(20)], "v long, d date"
    ).repartitionByRange(4, "d")
    write_snapshot(df, t, stats_cols=["d"])
    lo = dt.date(2026, 1, 18)
    kept, total = files_for_read(t, skip_filter={"d": (lo, None)})
    assert total == 4 and len(kept) < total
    got = sorted(
        r.v
        for r in read_snapshot(spark, t, skip_filter={"d": (lo, None)})
        .filter(F.col("d") >= F.lit(lo))
        .collect()
    )
    assert got == [17, 18, 19]


def test_layout_by_on_empty_df_commits_empty_version(spark, tmp_path):
    """min/max of an empty (or all-NULL-key) input aggregate to NULL;
    the layout must be skipped, not crash, and the commit proceed like
    the non-layout path's empty commit."""
    t = str(tmp_path / "tbl")
    empty = spark.range(0).withColumnRenamed("id", "v")
    v = write_snapshot(empty, t, layout_by=["v"])
    assert v == 0
    assert read_snapshot(spark, t).count() == 0
    # appending real data afterwards works and stats/skipping resume
    write_snapshot(
        spark.range(10).withColumnRenamed("id", "v"),
        t,
        mode="append",
        layout_by=["v"],
    )
    assert read_snapshot(spark, t).count() == 10


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: a reader names a wall-clock instant and gets the
    version that was current then; pre-creation instants raise."""
    import time as _t

    from wrtd_etl_spark.sources.versioned import version_as_of

    t = str(tmp_path / "tbl")
    before = _t.time()
    write_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    t0 = _t.time()
    _t.sleep(0.05)
    write_snapshot(spark.range(10, 12).withColumnRenamed("id", "v"), t)
    t1 = _t.time()
    assert version_as_of(t, t0) == 0
    assert version_as_of(t, t1) == 1
    assert _vals(read_snapshot(spark, t, as_of=t0)) == [0, 1, 2]
    assert _vals(read_snapshot(spark, t, as_of=t1)) == [10, 11]
    with pytest.raises(ValueError):
        version_as_of(t, before - 10)
    with pytest.raises(ValueError, match="not both"):
        read_snapshot(spark, t, version=0, as_of=t0)


def test_maybe_compact_fires_only_over_threshold(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import (
        data_file_count,
        maybe_compact,
    )

    t = str(tmp_path / "tbl")
    for lo in (0, 5, 10):
        write_snapshot(
            spark.range(lo, lo + 5).repartition(3).withColumnRenamed("id", "v"),
            t,
            mode="append" if lo else "overwrite",
        )
    n = data_file_count(t)
    assert n >= 9
    # under threshold: a no-op that reads only the manifest
    assert maybe_compact(spark, t, max_files=n) is None
    assert data_file_count(t) == n
    # over threshold: one compaction commit
    v = maybe_compact(spark, t, max_files=n - 1, target_files=2)
    assert v == 3
    assert data_file_count(t) <= 2
    assert _vals(read_snapshot(spark, t)) == list(range(15))


def test_versioned_sink_inline_compaction_keeps_exactly_once(spark, tmp_path):
    """compact_above on the streaming append sink: files stay bounded
    across many micro-batches AND a replayed batch after compaction is
    still a no-op (the ledger rides the compacted manifest's extra)."""
    from wrtd_etl_spark.sources.versioned import data_file_count
    from wrtd_etl_spark.streaming.versioned_sink import (
        make_versioned_append_sink,
    )

    t = str(tmp_path / "tbl")
    sink = make_versioned_append_sink(t, compact_above=4)
    for bid in range(6):
        sink(
            spark.range(bid * 10, bid * 10 + 10)
            .repartition(2)
            .withColumnRenamed("id", "v"),
            bid,
        )
    assert data_file_count(t) <= 5  # bounded, not 12
    n = read_snapshot(spark, t).count()
    assert n == 60
    sink(
        spark.range(50, 60).repartition(2).withColumnRenamed("id", "v"), 5
    )  # replay of the last batch
    assert read_snapshot(spark, t).count() == 60


def test_compact_reapplies_clustered_layout(spark, tmp_path):
    """The r5 weak: a clustered table must stay clustered THROUGH
    maintenance. write_snapshot(layout_by=) records the layout spec in
    the manifest; unclustered appends (the streaming-sink pattern) widen
    per-file stats until auto-compaction fires — which must RE-APPLY the
    recorded Z-order, so a range read prunes again instead of silently
    scanning everything forever."""
    from wrtd_etl_spark.sources.versioned import (
        files_for_read,
        manifest_info,
        maybe_compact,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.range(1000).withColumnRenamed("id", "v"),
        t,
        layout_by=["v"],
        layout_files=8,
    )
    assert manifest_info(t)["layout"] == {"by": ["v"], "files": 8}
    # unclustered appends: each commit's rows span the WHOLE key range,
    # so every appended file has wide stats and defeats pruning
    for i in range(4):
        scattered = (
            spark.range(1000, 1200)
            .select(((F.col("id") * 37 + i) % 1000 + 1000).alias("v"))
            .repartition(3)
        )
        write_snapshot(scattered, t, mode="append")
    # the appends carried the layout spec forward without re-clustering
    assert manifest_info(t)["layout"] == {"by": ["v"], "files": 8}
    kept_pre, total_pre = files_for_read(t, skip_filter={"v": (0, 99)})
    assert total_pre >= 8 + 12
    v = maybe_compact(spark, t, max_files=10)
    assert v is not None
    # compaction re-clustered into the recorded layout_files
    kept, total = files_for_read(t, skip_filter={"v": (0, 99)})
    assert total == 8
    assert len(kept) <= total / 3, (
        f"range read touches {len(kept)}/{total} files after compaction "
        "— layout was not re-applied"
    )
    assert manifest_info(t)["layout"] == {"by": ["v"], "files": 8}
    got = sorted(r.v for r in read_snapshot(spark, t).collect())
    want = sorted(
        list(range(1000))
        + [(i2 * 37 + i) % 1000 + 1000 for i in range(4) for i2 in range(1000, 1200)]
    )
    assert got == want


def test_rewrite_keeps_layout_clustering(spark, tmp_path):
    """Surgical rewrites (update/delete/merge) on a clustered table must
    re-cluster the replacement segment: after an update the per-file
    stats still prune a range read, and a skip_filter read returns the
    updated values."""
    from wrtd_etl_spark.sources.versioned import files_for_read, update_where

    t = str(tmp_path / "tbl")
    df = spark.range(1000).select(
        F.col("id").alias("v"), F.lit("old").alias("flag")
    )
    write_snapshot(df, t, layout_by=["v"], layout_files=8)
    # rewrite everything (prune=None) — the worst case for de-clustering
    update_where(
        spark,
        t,
        F.col("v") < 10,
        {"flag": F.lit("new")},
        prune=None,
    )
    kept, total = files_for_read(t, skip_filter={"v": (900, None)})
    assert len(kept) <= max(1, total / 3), (
        f"range read touches {len(kept)}/{total} files after update "
        "— rewrite de-clustered the table"
    )
    rows = read_snapshot(spark, t, skip_filter={"v": (0, 9)}).filter(
        F.col("v") < 10
    )
    assert all(r.flag == "new" for r in rows.collect())
    assert read_snapshot(spark, t).filter(F.col("flag") == "new").count() == 10


def test_long_string_stats_truncate_but_never_misprune(spark, tmp_path):
    """Manifest min/max on a long-string column store at most
    STAT_STRING_MAX+1 chars (lower bound truncates, upper bound
    truncates-then-increments so it stays a strict upper bound) —
    stats on a document-text column must not embed whole documents in
    every manifest — and pruning stays an over-approximation."""
    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.sources.versioned import (
        files_for_read,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    docs = [(i, chr(ord("a") + i % 4) * 500 + f"tail{i}") for i in range(40)]
    write_snapshot(
        spark.createDataFrame(docs, "k long, text string").repartition(4),
        t,
        stats_cols=["text"],
    )
    m = V._read_manifest(t, 0)
    bounds = [
        b
        for seg in V._segments(m)
        for st in seg.get("stats", {}).values()
        for b in st.get("text", [])
    ]
    assert bounds and all(len(b) <= V.STAT_STRING_MAX + 1 for b in bounds)
    # equality-shaped range on a real prefix: the matching rows survive
    kept, total = files_for_read(
        t, skip_filter={"text": ("b" * 10, "b" * 10 + "￿")}
    )
    got = (
        read_snapshot(spark, t)
        .where("text LIKE 'bbbb%'")
        .count()
    )
    assert got == 10  # nothing mispruned
    # a range past every upper bound prunes all files
    kept2, _ = files_for_read(t, skip_filter={"text": ("zzz", None)})
    assert kept2 == []


def test_trunc_string_stat_edges():
    """Pure-unit edges of the bound truncation: the lower bound is
    always <= the original, the upper always >= it (strictly > for
    every string sharing the truncated prefix), the surrogate-boundary
    increment (U+D7FF steps OVER the surrogate range to U+E000, never
    minting an unencodable lone surrogate) survives a JSON round-trip
    and UTF-8 encoding, and an all-U+10FFFF prefix keeps the full
    value."""
    import json as _json

    from wrtd_etl_spark.sources.versioned import (
        STAT_STRING_MAX as M,
        _stat_rank,
        _trunc_string_stat,
    )

    lo, hi = _trunc_string_stat("a" * 200, "b" * 200)
    assert lo == "a" * M and len(hi) <= M
    assert lo <= "a" * 200 and hi > "b" * 200
    # increment lands exactly on the UTF-16 surrogate boundary: the
    # successor of U+D7FF must skip the surrogates (unencodable as
    # UTF-8) and land on U+E000 — still a strict upper bound
    s = "x" * (M - 1) + "퟿" + "tail-beyond-the-cut"
    lo2, hi2 = _trunc_string_stat("a", s)
    assert hi2 == "x" * (M - 1) + "" and hi2 > s
    assert _json.loads(_json.dumps(hi2)) == hi2  # manifest round-trip
    hi2.encode("utf-8")  # every consumer of the bound can encode it
    assert _stat_rank(hi2) is not None
    # a LEGACY bound minted by the pre-fix increment (lone U+D800, as
    # old manifests may still store) must rank without crashing
    legacy = "x" * (M - 1) + "\ud800"
    assert _stat_rank(legacy) is not None
    assert _stat_rank(legacy) >= _stat_rank("x" * M)
    # rightmost non-maximal char increments; maximal tail drops
    s3 = "m" * (M - 2) + chr(0x10FFFF) * 10
    _, hi3 = _trunc_string_stat("a", s3)
    assert hi3 == "m" * (M - 3) + "n" and hi3 > s3
    # pathological all-maximal prefix: keep the full value (still valid)
    s4 = chr(0x10FFFF) * (M + 10)
    _, hi4 = _trunc_string_stat("a", s4)
    assert hi4 == s4
    # short strings pass through untouched; non-strings too
    assert _trunc_string_stat("ab", "cd") == ["ab", "cd"]
    assert _trunc_string_stat(1, 2) == [1, 2]
