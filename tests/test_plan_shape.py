"""Physical-plan regression tests: the scale guarantees the engine claims
(pushdown, broadcast joins, no raw-fact global windows) must be visible in
the plans, not just intended."""

from __future__ import annotations

import contextlib
import io

from wrtd_etl_spark.plans import REGISTRY
from wrtd_etl_spark.plans import testdata_queries  # noqa: F401 (registers)

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read l_orderkey/l_partkey/l_suppkey
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_dim_joins_are_broadcast(spark):
    for name in ("top_customers", "nation_pair_revenue", "first_event"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_global_window_runs_on_preaggregated_input(spark):
    """The dense_rank window must sit ABOVE the aggregate in the plan —
    i.e. the single-partition exchange only ever sees one row per group."""
    import re

    plan = _plan(spark, "top_customers")
    assert "Window" in plan and "HashAggregate" in plan
    # formatted explain numbers operators leaves-first, so the aggregate
    # feeding the window must carry a SMALLER operator id
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    assert win_ids and agg_ids
    assert min(agg_ids) < min(win_ids)


def test_anti_join_is_join_not_collect(spark):
    plan = _plan(spark, "inactive_customers")
    assert "LeftAnti" in plan or "left_anti" in plan.lower()
