"""COPY INTO (sources/copy_into.py, r12): idempotent name-ledgered bulk
file ingest — the reference's fetch-then-load landing-zone shape
(reference botrun.py) with Delta's exactly-once answer: the loaded-file
ledger and the data commit atomically, so any crash/retry re-run is a
no-op for already-committed files."""

from __future__ import annotations

import os

import pytest

from wrtd_etl_spark.sources.copy_into import copy_into, copy_status
from wrtd_etl_spark.sources.versioned import (
    latest_version,
    read_snapshot,
    rollback,
)
from wrtd_etl_spark.sources.versioned_sql import versioned_sql


def _land(spark, d, name, rows):
    """Write one single-file parquet batch into the landing dir."""
    p = os.path.join(d, name)
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    return p


def test_copy_into_idempotent_incremental(spark, tmp_path):
    land = str(tmp_path / "land")
    t = str(tmp_path / "t")
    _land(spark, land, "b1", [(1, "a"), (2, "b")])
    v0 = copy_into(spark, t, land)
    assert v0 == 0 and read_snapshot(spark, t).count() == 2
    # re-run: nothing new → no commit at all
    assert copy_into(spark, t, land) is None
    assert latest_version(t) == 0
    # a second landed batch loads ONLY its own files
    _land(spark, land, "b2", [(3, "c")])
    st = copy_status(t, land)
    assert len(st["pending"]) == 1 and st["changed"] == []
    v1 = copy_into(spark, t, land)
    assert v1 == 1
    assert {r.k for r in read_snapshot(spark, t).collect()} == {1, 2, 3}
    # and the re-run is again a no-op
    assert copy_into(spark, t, land) is None


def test_copy_into_sql_and_pattern(spark, tmp_path):
    land = str(tmp_path / "land")
    t = str(tmp_path / "t")
    _land(spark, land, "keep_x", [(1, "a")])
    _land(spark, land, "skip_y", [(9, "z")])
    v = versioned_sql(
        spark,
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        "PATTERN = 'keep_*/*.parquet'",
        tables={"t": t},
    )
    assert v == 0
    assert {r.k for r in read_snapshot(spark, t).collect()} == {1}
    # widening the pattern later loads only the not-yet-loaded files
    versioned_sql(spark, f"COPY INTO t FROM '{land}'", tables={"t": t})
    assert {r.k for r in read_snapshot(spark, t).collect()} == {1, 9}
    with pytest.raises(ValueError, match="cannot parse"):
        versioned_sql(spark, "COPY INTO t FROM bad", tables={"t": t})


def test_copy_into_ledger_survives_maintenance_and_rollback(spark, tmp_path):
    """The ledger rides `extra`, which compaction carries; ROLLBACK
    rewinds the ledger WITH the data (the restored version's extra), so
    the file whose load was rolled back is pending again — data and
    ledger can never disagree."""
    from wrtd_etl_spark.sources.versioned import compact

    land = str(tmp_path / "land")
    t = str(tmp_path / "t")
    _land(spark, land, "b1", [(1, "a")])
    copy_into(spark, t, land)
    _land(spark, land, "b2", [(2, "b")])
    copy_into(spark, t, land)
    compact(spark, t)
    assert copy_into(spark, t, land) is None  # ledger survived compact
    rollback(t, 0)  # undo b2's load (and its ledger entry)
    st = copy_status(t, land)
    assert len(st["pending"]) == 1
    copy_into(spark, t, land)
    assert {r.k for r in read_snapshot(spark, t).collect()} == {1, 2}


def test_copy_into_changed_file_reported_not_reingested(spark, tmp_path):
    land = str(tmp_path / "land")
    t = str(tmp_path / "t")
    p = _land(spark, land, "b1", [(1, "a")])
    copy_into(spark, t, land)
    # mutate the landed file (breaks the immutability contract)
    f = next(
        os.path.join(p, x) for x in os.listdir(p) if x.endswith(".parquet")
    )
    with open(f, "ab") as fh:
        fh.write(b"XX")
    st = copy_status(t, land)
    assert st["changed"] == [f] and st["pending"] == []
    assert copy_into(spark, t, land) is None  # never silently re-ingested


def test_convert_to_versioned_zero_copy_adoption(spark, tmp_path):
    """CONVERT (r12): an existing plain-parquet directory becomes
    versioned v0 in place — inodes untouched, schema drift across files
    reads through the evolved-union path, optional stats arrive with
    the conversion, and the adopted table immediately supports the full
    surface (SQL SELECT, DML, time travel, ANALYZE)."""
    import os

    from wrtd_etl_spark.sources.versioned import (
        convert_to_versioned,
        files_for_read,
        read_snapshot,
        update_where,
    )

    d = str(tmp_path / "plain")
    # two schema generations, written as ordinary parquet
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k long, v string"
    ).coalesce(1).write.parquet(os.path.join(d, "gen1"))
    spark.createDataFrame(
        [(10, "w", 1.5)], "k long, v string, score double"
    ).coalesce(1).write.parquet(os.path.join(d, "gen2"))
    inodes = {}
    for dp, dn, fn in os.walk(d):
        for f in fn:
            if f.endswith(".parquet"):
                p = os.path.join(dp, f)
                inodes[p] = os.stat(p).st_ino

    v = convert_to_versioned(spark, d, stats_cols=["k"])
    assert v == 0
    df = read_snapshot(spark, d)
    assert set(df.columns) == {"k", "v", "score"}
    got = {(r.k, r.v, r.score) for r in df.collect()}
    assert (10, "w", 1.5) in got and (0, "v0", None) in got
    assert len(got) == 6
    # zero-copy: every adopted file kept its inode
    for p, ino in inodes.items():
        assert os.stat(p).st_ino == ino
    # stats arrived with the conversion: k-range pruning works
    kept, total = files_for_read(d, skip_filter={"k": (100, None)})
    assert total == 2 and len(kept) == 0
    # the adopted table is a first-class citizen: SQL + DML + travel
    versioned_sql(
        spark, "UPDATE t SET v = 'adopted' WHERE k = 10", tables={"t": d}
    )
    row = versioned_sql(
        spark, "SELECT v FROM t WHERE k = 10", tables={"t": d}
    ).head()
    assert row.v == "adopted"
    assert read_snapshot(spark, d, version=0).filter(
        "k = 10"
    ).head().v == "w"
    with pytest.raises(ValueError, match="already a versioned table"):
        convert_to_versioned(spark, d)


def test_convert_sql_and_refusals(spark, tmp_path):
    import os

    from wrtd_etl_spark.sources.versioned import read_snapshot

    d = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(
        os.path.join(d, "b")
    )
    v = versioned_sql(
        spark,
        f"CONVERT TO VERSIONED `{d}` STATISTICS FOR COLUMNS k",
        tables={},
    )
    assert v == 0 and read_snapshot(spark, d).count() == 1
    with pytest.raises(FileNotFoundError, match="no parquet"):
        from wrtd_etl_spark.sources.versioned import convert_to_versioned

        e = str(tmp_path / "empty")
        os.makedirs(e)
        convert_to_versioned(spark, e)
