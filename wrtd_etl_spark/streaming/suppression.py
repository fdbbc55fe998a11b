"""Rate-limited alerting: suppress re-alerts within a window (T5).

Reference: bot/botrun.py:250-269 — a stream-online alert fires only if 8
hours have passed since the last *fired* alert (state in SQLite). The kept
set is a sequential chain per key (each kept alert resets the window), so
it is not expressible as a join/window — this is the engine's genuine
stateful operator.

Two implementations with identical semantics:

* batch: ``applyInPandas`` per key — sorted scan, linear per group;
* streaming: ``applyInPandasWithState`` with the last-fired timestamp as
  GroupState (the 100 TB shape: state is one timestamp per key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "user_id long, ts timestamp_ntz, alert_rank int"


def _keep_chain(pdf: pd.DataFrame, window_s: float) -> pd.DataFrame:
    """Sequential suppression scan for one key (sorted by ts)."""
    pdf = pdf.sort_values("ts")
    kept_ts = []
    kept_idx = []
    last = None
    for idx, t in zip(pdf.index, pdf["ts"]):
        if last is None or (t - last).total_seconds() >= window_s:
            kept_idx.append(idx)
            kept_ts.append(t)
            last = t
    out = pdf.loc[kept_idx, ["user_id", "ts"]].copy()
    out["alert_rank"] = range(1, len(kept_idx) + 1)
    out["alert_rank"] = out["alert_rank"].astype("int32")
    return out


def suppress_alerts(
    events: DataFrame,
    hours: float = 8.0,
    alert_type: str = "error",
) -> DataFrame:
    """Alerts that actually fire under the suppression window (batch).

    Grouped by user: the first alert fires, later ones only once the
    window has elapsed since the last FIRED one (not the last seen one —
    exactly the reference's semantics where only fired alerts update the
    SQLite timestamp, bot/botrun.py:264).
    """
    window_s = hours * 3600.0
    alerts = events.filter(F.col("event_type") == alert_type).select("user_id", "ts")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _keep_chain(pdf, window_s)

    return alerts.groupBy("user_id").applyInPandas(run, schema=OUT_SCHEMA)


STREAM_OUT_SCHEMA = "user_id long, ts timestamp, alert_rank int"
STATE_SCHEMA = "last_fired timestamp, fired int"


def suppress_alerts_stream(
    events,  # streaming DataFrame with (user_id, ts timestamp, event_type)
    hours: float = 8.0,
    alert_type: str = "error",
):
    """Streaming twin of :func:`suppress_alerts`: the last-FIRED timestamp
    lives in GroupState (one row per key — the bounded-state shape), so the
    suppression chain survives across micro-batches.

    ``applyInPandasWithState`` contract: per key, an iterator of pandas
    batches + a GroupState; emits the alerts that fire this batch."""
    from collections.abc import Iterator

    window_s = hours * 3600.0

    def fn(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last, fired = state.get
        else:
            last, fired = None, 0
        out_ts, out_rank = [], []
        for pdf in batches:
            for t in pdf.sort_values("ts")["ts"]:
                t_py = t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
                if last is None or (t_py - last).total_seconds() >= window_s:
                    fired += 1
                    last = t_py
                    out_ts.append(t_py)
                    out_rank.append(fired)
        state.update((last, fired))
        if out_ts:
            yield pd.DataFrame(
                {"user_id": user_id, "ts": out_ts, "alert_rank": out_rank}
            )

    return (
        events.filter(F.col("event_type") == alert_type)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=STREAM_OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
