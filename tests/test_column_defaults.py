"""Column DEFAULTs (r10 — Iceberg v3's initial-default, closing the r9
VERDICT sharp edge #1): ``alter_add_column(..., default=X)`` is pure
metadata, yet every segment written without the column reads X instead
of NULL — on the JVM read path, the Arrow DataSource, the SQL view, the
physical change feed, and inside every CDC diff (where a NULL pad would
have flipped carried rows into insert+delete churn)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import wrtd_etl_spark.sources.versioned as V
from wrtd_etl_spark.sources.versioned import (
    alter_add_column,
    alter_drop_column,
    compact,
    merge_into,
    read_snapshot,
    table_changes,
    table_changes_physical,
    write_snapshot,
)


def _base(spark, t, n=6):
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(n)], "k long, v string"
        ),
        t,
        stats_cols=["k"],
    )


def test_default_fills_existing_rows_and_future_omissions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=1.5)
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert got == {i: 1.5 for i in range(6)}
    # an append WITH the column keeps its explicit values — even NULL
    write_snapshot(
        spark.createDataFrame(
            [(100, "x", 9.0), (101, "y", None)],
            "k long, v string, score double",
        ),
        t,
        mode="append",
    )
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert got[100] == 9.0 and got[101] is None and got[0] == 1.5
    # time travel to the pre-alter version never shows the column
    assert read_snapshot(spark, t, version=0).columns == ["k", "v"]


def test_default_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    with pytest.raises(ValueError, match="JSON-native"):
        alter_add_column(spark, t, "bad", "array<long>", default=[1, 2])


def test_rewrite_materializes_default_then_drop_clears_it(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=2.0)
    compact(spark, t)  # bakes the default into real bytes
    m = V._read_manifest_root(t, V._read_pointer(t))
    assert m["defaults"] == {"score": 2.0}
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert all(s == 2.0 for s in got.values())
    # DROP kills the default; a re-add of the same name starts clean
    alter_drop_column(t, "score")
    alter_add_column(spark, t, "score", "double")
    assert V._read_manifest_root(t, V._read_pointer(t)).get(
        "defaults", {}
    ) == {}
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert all(s is None for s in got.values())


def test_keyed_cdc_pads_added_column_with_default(spark, tmp_path):
    """The sharp edge, closed: a range crossing an ALTER-with-default
    plus a compaction must fold EMPTY — carried rows read the default
    on the new side, so a NULL pad would have emitted an insert+delete
    pair for every row in the table."""
    t = str(tmp_path / "tbl")
    _base(spark, t, n=50)
    alter_add_column(spark, t, "score", "double", default=3.0)  # v1
    compact(spark, t)  # v2: rewrite materializes the default
    assert table_changes(spark, t, 0, 2).count() == 0
    # a real edit inside the range still surfaces — with the default
    # visible on the delete image of the pre-alter row
    merge_into(
        spark,
        t,
        spark.createDataFrame(
            [(7, "v7", 99.0)], "k long, v string, score double"
        ),
        keys=["k"],
    )  # v3
    rows = sorted(
        (r.k, r.score, r._change_type)
        for r in table_changes(spark, t, 0, 3).collect()
    )
    assert rows == [(7, 3.0, "delete"), (7, 99.0, "insert")]


def test_exceptall_fallback_pads_with_default_too(spark, tmp_path):
    """Overwrite ranges (keyed proof refused) harmonize schemas with
    the same default pad."""
    t = str(tmp_path / "tbl")
    _base(spark, t, n=10)
    alter_add_column(spark, t, "score", "double", default=4.0)  # v1
    # overwrite with the SAME logical rows, column materialized at the
    # default: the diff across v0 -> v2 must cancel entirely
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}", 4.0) for i in range(10)],
            "k long, v string, score double",
        ),
        t,
        mode="overwrite",
    )  # v2
    assert table_changes(spark, t, 0, 2).count() == 0


def test_datasource_and_sql_surface_fill_defaults(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned_table import (
        read_versioned,
        register_versioned_view,
    )

    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=5.5)
    write_snapshot(
        spark.createDataFrame(
            [(100, "x", 9.0)], "k long, v string, score double"
        ),
        t,
        mode="append",
    )
    jvm = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    ds = {r.k: r.score for r in read_versioned(spark, t).collect()}
    assert ds == jvm and ds[0] == 5.5 and ds[100] == 9.0
    register_versioned_view(spark, "dflt_view", t)
    sql = {
        r.k: r.score
        for r in spark.sql("SELECT k, score FROM dflt_view").collect()
    }
    assert sql == jvm


def test_physical_change_feed_fills_defaults(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=7.0)
    feed = table_changes_physical(spark, t, 0)  # replays the v0 files
    rows = {r.k: r.score for r in feed.collect()}
    assert rows == {}  # the ALTER itself adds no files
    feed0 = table_changes_physical(spark, t, -1)
    rows0 = {r.k: r.score for r in feed0.collect()}
    assert all(s == 7.0 for s in rows0.values()) and len(rows0) == 6


def test_streaming_change_feed_fills_defaults(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned_stream import read_changes_stream

    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=8.0)
    write_snapshot(
        spark.createDataFrame(
            [(100, "x", 1.0)], "k long, v string, score double"
        ),
        t,
        mode="append",
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    (
        read_changes_stream(spark, t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {r.k: r.score for r in spark.read.parquet(out).collect()}
    assert got[0] == 8.0 and got[100] == 1.0


@pytest.mark.parametrize("strategy", ["cow", "dv"])
def test_dml_paths_agree_on_defaults(spark, tmp_path, strategy):
    """Every DML shape × both physical strategies: matched updates keep
    the (filled) default, merge INSERTS omitting the column get the
    write-default — not the NULL the rewrite files would otherwise
    materialize — and CoW/MoR agree row for row."""
    from wrtd_etl_spark.sources.versioned import update_where

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(1, 10), (2, 20), (4, 40)], "k long, v long"
        ),
        t,
        stats_cols=["k"],
    )
    alter_add_column(spark, t, "d", "long", default=7)
    merge_into(
        spark,
        t,
        spark.createDataFrame([(2, 222), (3, 333)], "k long, v long"),
        keys=["k"],
        strategy=strategy,
    )
    update_where(spark, t, F.col("k") == 4, {"v": F.lit(44)}, strategy=strategy)
    got = sorted(
        (r.k, r.v, r.d) for r in read_snapshot(spark, t).collect()
    )
    assert got == [(1, 10, 7), (2, 222, 7), (3, 333, 7), (4, 44, 7)]


def test_replace_where_fills_write_default(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import replace_where

    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=1.25)
    replace_where(
        spark,
        t,
        F.col("k") == 2,
        spark.createDataFrame([(2, "new2")], "k long, v string"),
    )
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert got[2] == 1.25 and got[0] == 1.25


def test_widen_defaulted_column_keeps_the_default(spark, tmp_path):
    """Feature interaction: widening a DEFAULTed column re-types the
    fill — pre-ALTER rows still read the (now wide) default, explicit
    values keep theirs, and a post-widen append omitting the column
    still gets the default at the wide type."""
    from wrtd_etl_spark.sources.versioned import alter_widen_column

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), t
    )
    alter_add_column(spark, t, "d", "int", default=7)
    alter_widen_column(spark, t, "d", "long")
    write_snapshot(
        spark.createDataFrame([(3, 30)], "k long, v long"),
        t,
        mode="append",
    )
    df = read_snapshot(spark, t)
    assert dict(df.dtypes)["d"] == "bigint"
    assert {r.k: r.d for r in df.collect()} == {1: 7, 2: 7, 3: 7}
    merge_into(
        spark,
        t,
        spark.createDataFrame([(2, 222, 9), (4, 44, None)],
                              "k long, v long, d long"),
        keys=["k"],
    )
    got = {r.k: r.d for r in read_snapshot(spark, t).collect()}
    assert got == {1: 7, 2: 9, 3: 7, 4: None}
