"""Stream-stream interval join (event-time bounded, watermarked).

The Structured Streaming surface the other streaming operators don't
cover: joining TWO unbounded streams. Without bounds this needs infinite
state (every row might match a future row); the production shape is

* a watermark on BOTH sides (how late either stream can be), and
* an event-time range in the join condition (how far apart matches can be)

— together they let the state store evict rows whose match window has
passed: per-key state is bounded by watermark + interval, not stream
length. That eviction contract is exactly what makes the operator viable
at 100 TB/day; the join itself shuffles both sides on the equi-key
(user_id) like any hash join.

Driven with ``availableNow`` over the single-file events table the inner
join emits every match in the first micro-batch, so the result equals the
batch inequality join exactly — which gives the registry entry a real SQL
oracle (same determinism argument as stream_event_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    minutes: int = 60,
    lateness: str = "2 hours",
) -> DataFrame:
    """Pairs (user_id, error_ts, click_ts): a ``right_type`` event in the
    ``minutes`` window before each ``left_type`` event of the same user.

    ``events`` is a streaming frame with (user_id, ts TIMESTAMP,
    event_type). Output timestamps are cast to TIMESTAMP_NTZ for a stable
    cross-engine comparison surface (session tz pinned UTC).
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(F.col("user_id"), F.col("ts").alias("error_ts"))
        .withWatermark("error_ts", lateness)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(F.col("user_id").alias("r_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", lateness)
    )
    cond = (
        (left["user_id"] == right["r_user_id"])
        & (right["click_ts"] >= left["error_ts"] - F.expr(f"INTERVAL {minutes} MINUTES"))
        & (right["click_ts"] <= left["error_ts"])
    )
    return left.join(right, cond, "inner").select(
        "user_id",
        F.col("error_ts").cast("timestamp_ntz").alias("error_ts"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
    )


def interval_join_stream_outer(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    minutes: int = 60,
    lateness: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER twin of :func:`interval_join_stream`: every
    ``left_type`` event appears — with its matching ``right_type`` rows,
    or ONCE with ``click_ts`` NULL if none arrived in the window.

    This is the late-arriving-enrichment shape (did a click precede this
    error, or provably not?): the engine may only emit the NULL row when
    it can prove no match is coming, i.e. when the watermark passes the
    left row's event time — so null padding is released at watermark
    close, from the same bounded state the inner join keeps (nothing
    extra is retained; the outer variant just reports evictions instead
    of discarding them). Left rows YOUNGER than (max event time −
    lateness) are still open when a bounded run ends: provably
    unmatched-so-far but not provably unmatched, so they are withheld —
    the oracle must apply the same cutoff."""
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(F.col("user_id"), F.col("ts").alias("error_ts"))
        .withWatermark("error_ts", lateness)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(F.col("user_id").alias("r_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", lateness)
    )
    cond = (
        (left["user_id"] == right["r_user_id"])
        & (right["click_ts"] >= left["error_ts"] - F.expr(f"INTERVAL {minutes} MINUTES"))
        & (right["click_ts"] <= left["error_ts"])
    )
    return left.join(right, cond, "left_outer").select(
        "user_id",
        F.col("error_ts").cast("timestamp_ntz").alias("error_ts"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
    )
