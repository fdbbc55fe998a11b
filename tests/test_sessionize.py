"""Pin the sessionize lag-gap boundary semantics (operators/sessionize.py).

VERDICT r1 asked for the truncation-vs-boundary-crossing contract to be
pinned with sub-second timestamps: gaps compare TRUNCATED whole seconds
(matching DuckDB's date_diff('second', ...) boundary-count), with strict
``>`` on the gap, so sub-second fractions alone never flip a boundary.
"""

from __future__ import annotations

import datetime as dt

from wrtd_etl_spark.operators.sessionize import sessionize

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, _T0 + dt.timedelta(seconds=s), i) for i, (u, s) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long",
    )


def _ids(df):
    return [
        r.session_id
        for r in df.orderBy("user_id", "ts", "event_id").collect()
    ]


def test_gap_exactly_timeout_continues_session(spark):
    # strict >: a gap of exactly gap_seconds does NOT start a new session
    df = _df(spark, [(1, 0), (1, 1800), (1, 3601)])
    assert _ids(sessionize(df, gap_seconds=1800)) == [1, 1, 2]


def test_subsecond_fraction_never_flips_boundary(spark):
    # 0.0s → 1800.9s is a wall-clock gap of 1800.9s, but truncated-second
    # arithmetic sees 1800 - 0 = 1800 → same session (matches DuckDB's
    # date_diff('second', ...) which counts crossed second boundaries)
    df = _df(spark, [(1, 0.0), (1, 1800.9)])
    assert _ids(sessionize(df, gap_seconds=1800)) == [1, 1]

    # 0.9s → 1801.0s is a wall-clock gap of 1800.1s; truncated seconds give
    # 1801 - 0 = 1801 > 1800 → new session. The boundary count, not the
    # elapsed duration, is the contract.
    df2 = _df(spark, [(1, 0.9), (1, 1801.0)])
    assert _ids(sessionize(df2, gap_seconds=1800)) == [1, 2]


def test_sessions_number_per_key_and_tiebreak(spark):
    df = _df(spark, [(1, 0), (2, 0), (1, 5000), (2, 10), (2, 9000)])
    got = {
        (r.user_id, r.event_id, r.session_id)
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {(1, 0, 1), (1, 2, 2), (2, 1, 1), (2, 3, 1), (2, 4, 2)}


def test_equal_timestamps_deterministic_via_tiebreak(spark):
    # two events at the same instant: the event_id tiebreak fixes their
    # order, and a same-instant pair can never split a session
    df = _df(spark, [(1, 100), (1, 100), (1, 100 + 1801)])
    assert _ids(sessionize(df, gap_seconds=1800)) == [1, 1, 2]
