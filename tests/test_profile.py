"""Column profiling (operators/profile.py): single-scan plan shape,
null accounting, and the approx (HLL) scale path's error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.operators.profile import profile_columns


def test_profile_counts_nulls_and_extremes(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (2, "a")],
        ["x", "s"],
    )
    rows = {r.col_name: r for r in profile_columns(df).collect()}
    assert rows["x"].n_rows == 4
    assert rows["x"].n_nulls == 1
    assert rows["x"].n_distinct == 2
    assert (rows["x"].min_value, rows["x"].max_value) == ("1", "2")
    assert rows["s"].n_nulls == 1
    assert rows["s"].n_distinct == 2
    assert (rows["s"].min_value, rows["s"].max_value) == ("a", "c")


def test_profile_exact_is_one_scan(spark):
    """The exact profile must not rescan per column: exactly one scan of
    the parquet relation appears in the physical plan."""
    orders = load_table(spark, SF_SMOKE, "orders")
    plan = profile_columns(
        orders, ["o_custkey", "o_orderstatus"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_profile_approx_tracks_exact_within_hll_error(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    exact = {r.col_name: r.n_distinct for r in profile_columns(orders, cols).collect()}
    approx = {
        r.col_name: r.n_distinct
        for r in profile_columns(orders, cols, exact=False).collect()
    }
    for c in cols:
        assert abs(approx[c] - exact[c]) <= max(2, 0.06 * exact[c]), (
            c,
            exact[c],
            approx[c],
        )
    # and the approx plan has no Expand node (the multi-distinct cost)
    plan = (
        profile_columns(orders, cols, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, plan
