"""SCD2 operator (operators/scd2.py): rebuild semantics + incremental
merge ≡ full rebuild on any time-split of the changelog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.operators.scd2 import scd2_from_changelog, scd2_merge


def _orders_log(spark):
    return load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
    )


def _key(r):
    return (r.custkey, r.status, r.valid_from, r.valid_to, r.is_current)


def test_scd2_rebuild_collapses_runs_and_opens_last(spark):
    log = _orders_log(spark)
    hist = scd2_from_changelog(log, ["custkey"], ["d", "k"], ["status"])
    rows = hist.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    assert by_key, "no history built"
    saw_collapse = False
    for cust, versions in by_key.items():
        versions.sort(key=lambda r: (r.valid_from, str(r.valid_to)))
        open_rows = [r for r in versions if r.is_current]
        assert len(open_rows) == 1, f"custkey {cust}: {len(open_rows)} open rows"
        assert open_rows[-1].valid_to is None
        # no two ADJACENT versions share a status (they would have collapsed)
        for a, b in zip(versions, versions[1:]):
            assert a.status != b.status
            assert a.valid_to == b.valid_from  # contiguous intervals
    # the collapse is non-vacuous: raw change-log rows > version rows
    n_raw = log.count()
    saw_collapse = n_raw > len(rows)
    assert saw_collapse, "test data never repeats a status — not exercising collapse"


@pytest.mark.parametrize("n_batches", [2, 3])
def test_scd2_merge_fold_equals_full_rebuild(spark, n_batches):
    """Folding the changelog batch-by-batch through scd2_merge must equal
    one full rebuild — including cross-batch-boundary collapse (a batch
    whose first row repeats the open row's status gets absorbed)."""
    log = _orders_log(spark).cache()
    full = scd2_from_changelog(log, ["custkey"], ["d", "k"], ["status"])
    expected = sorted(map(_key, full.collect()))

    days = sorted(r.d for r in log.select("d").distinct().collect())
    bounds = [days[len(days) * i // n_batches] for i in range(1, n_batches)]
    cuts = [None, *bounds, None]
    folded = None
    for i in range(n_batches):
        cond = F.lit(True)
        if cuts[i] is not None:
            cond = cond & (F.col("d") > F.lit(cuts[i]))
        if cuts[i + 1] is not None:
            cond = cond & (F.col("d") <= F.lit(cuts[i + 1]))
        batch = log.filter(cond)
        if folded is None:
            folded = scd2_from_changelog(
                batch, ["custkey"], ["d", "k"], ["status"]
            )
        else:
            folded = scd2_merge(
                folded, batch, ["custkey"], ["d", "k"], ["status"]
            )
        folded = spark.createDataFrame(folded.collect(), folded.schema)
    got = sorted(map(_key, folded.collect()))
    assert got == expected


def test_scd2_merge_absorb_and_close_unit(spark):
    """Pinned micro-case: absorbed first version extends the open row;
    changed first version closes it; unseen keys pass through."""
    cols = ["ck", "st", "d", "k"]
    base = spark.createDataFrame(
        [(1, "A", 1, 1), (1, "B", 2, 2), (2, "X", 1, 3), (3, "Z", 1, 4)], cols
    )
    hist = scd2_from_changelog(base, ["ck"], ["d", "k"], ["st"])
    batch = spark.createDataFrame(
        [
            (1, "B", 3, 5),  # same as open 'B' -> absorbed (stays one version)
            (1, "C", 4, 6),  # then a real change
            (2, "Y", 3, 7),  # change -> close X at d=3
            (4, "N", 3, 8),  # brand-new key
        ],
        cols,
    )
    merged = scd2_merge(hist, batch, ["ck"], ["d", "k"], ["st"])
    got = {(r.ck, r.st): (r.valid_from, r.valid_to, r.is_current) for r in merged.collect()}
    assert got == {
        (1, "A"): (1, 2, False),
        (1, "B"): (2, 4, False),  # absorbed the d=3 repeat, closed by 'C'
        (1, "C"): (4, None, True),
        (2, "X"): (1, 3, False),
        (2, "Y"): (3, None, True),
        (3, "Z"): (1, None, True),  # untouched key
        (4, "N"): (3, None, True),  # new key
    }


def test_temporal_dim_join_boundary_and_prehistory(spark):
    """Half-open interval semantics: a fact ON a change date sees the NEW
    version; before the first version -> NULL; after the last -> open row."""
    from wrtd_etl_spark.operators.scd2 import temporal_dim_join

    dim = spark.createDataFrame(
        [(1, "A", 10, 20, False), (1, "B", 20, None, True)],
        ["ck", "st", "valid_from", "valid_to", "is_current"],
    )
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 20), (103, 1, 99), (104, 2, 15)],
        ["fid", "k", "t"],
    )
    got = {
        r.fid: r.st
        for r in temporal_dim_join(facts, dim, "k", "ck", "t").collect()
    }
    assert got == {100: None, 101: "A", 102: "B", 103: "B", 104: None}
