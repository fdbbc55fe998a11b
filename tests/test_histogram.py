"""Equi-width histogram (operators/histogram.py)."""

from __future__ import annotations

import pytest

from wrtd_etl_spark.operators.histogram import equi_width_histogram


def test_histogram_edges_overflow_and_dense_zero_buckets(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (4.9,), (5.0,), (10.0,), (25.0,), (None,)],
        ["v"],
    )
    rows = {r.bucket: r for r in equi_width_histogram(df, "v", 4, (0.0, 20.0)).collect()}
    # under/overflow: -1 -> 0, 25 -> 5; edge 5.0 belongs to bucket 2; NULL dropped
    assert rows[0].n == 1
    assert rows[1].n == 2  # 0.0, 4.9
    assert rows[2].n == 1  # 5.0
    assert rows[3].n == 1  # 10.0
    assert rows[5].n == 1  # 25.0


def test_histogram_counts_and_bounds_detail(spark):
    df = spark.createDataFrame(
        [(0.0,), (4.9,), (5.0,), (10.0,), (19.99,), (20.0,)], ["v"]
    )
    rows = {r.bucket: r for r in equi_width_histogram(df, "v", 4, (0.0, 20.0)).collect()}
    assert rows[1].n == 2      # [0,5): 0.0, 4.9
    assert rows[2].n == 1      # [5,10): 5.0
    assert rows[3].n == 1      # [10,15): 10.0
    assert rows[4].n == 1      # [15,20): 19.99
    assert rows[5].n == 1      # >= hi overflow: 20.0
    assert (rows[2].lo, rows[2].hi) == (5.0, 10.0)
    # dense scaffold: buckets 1..4 always present even when empty
    empty = {r.bucket for r in equi_width_histogram(
        spark.createDataFrame([(100.0,)], ["v"]), "v", 4, (0.0, 20.0)
    ).collect()}
    assert {1, 2, 3, 4}.issubset(empty)


def test_histogram_auto_bounds_and_degenerate(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], ["v"])
    rows = equi_width_histogram(df, "v", 3).collect()
    assert sum(r.n for r in rows) == 10
    with pytest.raises(ValueError, match="degenerate"):
        equi_width_histogram(
            spark.createDataFrame([(1.0,), (1.0,)], ["v"]), "v", 3
        )
