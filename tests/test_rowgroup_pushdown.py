"""Row-group predicate pushdown in the Arrow executors (r9, VERDICT r8
ask #3): the stream + batch DataSource read path already pruned FILES
via manifest stats and COLUMNS via ``pq.read_table(columns=)``, but
read every row group of a surviving file. ``_load_file_table`` now
prunes row groups on the parquet footer's own min/max before any page
I/O — on a fat sorted file (128 MB ≈ 100 groups) a point lookup
materializes 1 group instead of 100.

Contract pinned here:
* materialization: only the groups whose stats can match are read
  (pyarrow footer arithmetic on a planted multi-group sorted file);
* superset semantics: the delivered rows, post-predicate, are IDENTICAL
  to the unfiltered read's — pruning is an I/O saver, never the filter;
* deletion-vector interlock: a file carrying a vector never row-group
  prunes (dv positions are absolute row indices; a skipped leading
  group would shift every surviving position) — rows stay exact;
* doubt keeps the group: missing stats, unknown column, type-mismatched
  bounds (ISO string vs timestamp stat) all no-op.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    delete_where,
    read_snapshot,
    write_snapshot,
)
from wrtd_etl_spark.sources.versioned_stream import (
    _load_file_table,
    _rg_keep_groups,
)


@pytest.fixture()
def tiny_row_groups(spark):
    """Force Spark's parquet writer into many small row groups (the
    planted fat-file shape) for the duration of one test."""
    hc = spark._jsc.hadoopConfiguration()
    old_block = hc.get("parquet.block.size")
    old_page = hc.get("parquet.page.size")
    hc.set("parquet.block.size", "4096")
    hc.set("parquet.page.size", "1024")
    yield
    for k, v in (
        ("parquet.block.size", old_block),
        ("parquet.page.size", old_page),
    ):
        if v is None:
            hc.unset(k)
        else:
            hc.set(k, v)


@pytest.fixture()
def sorted_file(tmp_path):
    """10 row groups of 1000 rows each, k sorted 0..9999."""
    path = str(tmp_path / "sorted.parquet")
    tbl = pa.table(
        {
            "k": pa.array(range(10_000), pa.int64()),
            "v": pa.array([i * 10 for i in range(10_000)], pa.int64()),
            "s": pa.array([f"s{i:05d}" for i in range(10_000)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=1000)
    assert pq.ParquetFile(path).metadata.num_row_groups == 10
    return path


def test_point_read_materializes_one_group(sorted_file):
    got = _load_file_table(
        sorted_file, ["k", "v"], rg_filter={"pts": {"k": [2500]}}
    )
    # exactly ONE group (rows 2000..2999) materialized
    assert got.num_rows == 1000
    ks = got.column("k").to_pylist()
    assert min(ks) == 2000 and max(ks) == 2999
    # superset semantics: post-predicate rows identical to unfiltered
    full = _load_file_table(sorted_file, ["k", "v"])
    want = [r for r in full.to_pylist() if r["k"] == 2500]
    have = [r for r in got.to_pylist() if r["k"] == 2500]
    assert have == want and len(want) == 1


def test_range_read_materializes_matching_groups(sorted_file):
    got = _load_file_table(
        sorted_file, ["k"], rg_filter={"rng": {"k": [1500, 3499]}}
    )
    assert got.num_rows == 3000  # groups 1, 2, 3
    # half-open bounds: (None, hi] and [lo, None)
    assert (
        _load_file_table(
            sorted_file, ["k"], rg_filter={"rng": {"k": [None, 999]}}
        ).num_rows
        == 1000
    )
    assert (
        _load_file_table(
            sorted_file, ["k"], rg_filter={"rng": {"k": [9000, None]}}
        ).num_rows
        == 1000
    )


def test_no_match_returns_typed_empty(sorted_file):
    got = _load_file_table(
        sorted_file, ["k", "v"], rg_filter={"pts": {"k": [123456]}}
    )
    assert got.num_rows == 0
    assert got.schema.names == ["k", "v"]


def test_string_stats_prune_too(sorted_file):
    got = _load_file_table(
        sorted_file, ["k", "s"], rg_filter={"rng": {"s": ["s04500", "s04500"]}}
    )
    assert got.num_rows == 1000


def test_doubt_keeps_the_group(sorted_file):
    pf = pq.ParquetFile(sorted_file)
    # unknown column: nothing to prune on
    assert _rg_keep_groups(pf, {"rng": {"nope": [0, 1]}}) is None
    # type-mismatched bound (string vs int64 stats): kept
    assert _rg_keep_groups(pf, {"rng": {"k": ["0", "1"]}}) is None
    # empty filter: fast path
    assert _rg_keep_groups(pf, None) is None
    assert _rg_keep_groups(pf, {"rng": {}, "pts": {}}) is None


def test_datasource_point_read_rows_identical(spark, tmp_path):
    """End to end through the batch DataSource: a pushed point filter
    returns exactly the matching rows (Spark re-applies the predicate
    over the pruned groups)."""
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(4000)], "k long, v long"
    ).coalesce(1).sortWithinPartitions("k")
    write_snapshot(df, t, stats_cols=["k"])
    got = (
        read_versioned(spark, t, skip_filter={"k": (777, 777)})
        .filter("k = 777")
        .collect()
    )
    assert [(r.k, r.v) for r in got] == [(777, 7770)]
    # and WITHOUT the manual skip_filter, same result (pushFilters path
    # feeds the same rg pruning when the conf enables it)
    got2 = read_versioned(spark, t).filter("k = 777").collect()
    assert [(r.k, r.v) for r in got2] == [(777, 7770)]


def test_dv_file_skips_rg_pruning_rows_exact(
    spark, tmp_path, tiny_row_groups
):
    """A deletion-vectored MULTI-GROUP file must NOT row-group prune:
    positions are absolute — if a leading group were skipped, the
    vector would delete the WRONG surviving rows. The read stays
    row-exact with a narrowing skip_filter present."""
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(2000)], "k long, v long"
        ).coalesce(1).sortWithinPartitions("k"),
        t,
        stats_cols=["k"],
    )
    delete_where(
        spark, t, F.col("k") % 100 == 3, strategy="dv", prune=None
    )
    got = sorted(
        r.k
        for r in read_versioned(
            spark, t, skip_filter={"k": (1500, 2000)}
        ).collect()
        if r.k >= 1500
    )
    want = sorted(
        r.k for r in read_snapshot(spark, t).collect() if r.k >= 1500
    )
    assert got == want and len(want) == 495


def test_stream_delivers_pruned_superset(spark, tmp_path, tiny_row_groups):
    """The change feed with a skip_filter delivers at least the matching
    rows and at most the kept groups — downstream predicate equality."""
    from wrtd_etl_spark.sources.versioned_stream import read_changes_stream

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(3000)], "k long, v long"
        ).coalesce(1).sortWithinPartitions("k"),
        t,
        stats_cols=["k"],
    )
    rows = []

    def sink(batch, _bid):
        rows.extend(batch.collect())

    q = (
        read_changes_stream(spark, t, -1, skip_filter={"k": (100, 120)})
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = sorted(r.k for r in rows)
    assert set(range(100, 121)) <= set(ks)  # every matching row arrived
    assert len(ks) < 3000  # and the file was NOT fully materialized
    assert sorted(r.k for r in rows if 100 <= r.k <= 120) == list(
        range(100, 121)
    )
