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
