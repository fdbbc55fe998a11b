"""Batch sessionization: lag-gap detection + running session ids.

The classic sessionize-without-state construction (the batch twin of
``F.session_window`` streaming): one window over (key, ts) marks rows
whose gap from the previous row exceeds the timeout, a running sum of the
marks numbers the sessions. One exchange on the key; both window passes
share it.

Boundary contract (pinned by tests/test_testdata_queries.py):
* gaps are compared with STRICT ``>`` — a gap of exactly ``gap_seconds``
  continues the session (session_window's [start, end) uses ``>=``; both
  are legitimate, each is pinned by its own oracle);
* timestamps are compared on TRUNCATED whole seconds (``cast('long')``),
  matching DuckDB's ``date_diff('second', ...)`` boundary-crossing count —
  sub-second fractions never flip a session boundary on their own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Input rows + a ``session_id`` column (1-based per key).

    The ordering tiebreak makes session numbering deterministic when two
    events share a timestamp (§4.3.2 discipline).
    """
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev_epoch = F.lag(epoch).over(w)
    marked = events.withColumn(
        "__new_sess",
        F.when(
            prev_epoch.isNull() | (epoch - prev_epoch > gap_seconds), 1
        ).otherwise(0),
    )
    return marked.withColumn(
        "session_id",
        F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_sess")
