"""Materialized-view refresh (operators/materialized.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrtd_etl_spark.operators.materialized import (
    is_stale,
    refresh_materialized,
)
from wrtd_etl_spark.sources.versioned import read_snapshot, write_snapshot


def test_refresh_only_when_source_advances(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string"),
        src,
    )
    builds = []

    def build(s):
        builds.append(1)
        return (
            read_snapshot(s, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    sources = {"src": src}
    assert is_stale(view, sources)  # view doesn't exist yet
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (0, True, 1)
    assert {r.g: r.n for r in read_snapshot(spark, view).collect()} == {
        "a": 2,
        "b": 1,
    }

    # fresh: second refresh touches NO data and runs no build
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (0, False, 1)
    assert not is_stale(view, sources)

    # source advances -> stale -> one rebuild picks up the new rows
    write_snapshot(
        spark.createDataFrame([(4, "b")], "id long, g string"), src, mode="append"
    )
    assert is_stale(view, sources)
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (1, True, 2)
    assert {r.g: r.n for r in read_snapshot(spark, view).collect()} == {
        "a": 2,
        "b": 2,
    }
