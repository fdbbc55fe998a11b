"""Funnel operator (operators/funnel.py): strict-ordering semantics."""

from __future__ import annotations

import datetime as dt

from wrtd_etl_spark.operators.funnel import funnel


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_strict_order_and_partial_completion(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE click -> funnel stops at click
        (2, _ts(1), "view"), (2, _ts(5), "click"), (2, _ts(3), "purchase"),
        # u3: click tied with view -> strict > means not advanced
        (3, _ts(1), "view"), (3, _ts(1), "click"),
        # u4 never views -> absent from output
        (4, _ts(1), "click"), (4, _ts(2), "purchase"),
        # u5: earlier click ignored, later one counts
        (5, _ts(2), "view"), (5, _ts(1), "click"), (5, _ts(4), "click"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3, r.steps_completed)
        for r in funnel(events, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (_ts(1), _ts(2), _ts(3), 3)
    assert got[2] == (_ts(1), _ts(5), None, 2)
    assert got[3] == (_ts(1), None, None, 1)
    assert got[5] == (_ts(2), _ts(4), None, 2)
