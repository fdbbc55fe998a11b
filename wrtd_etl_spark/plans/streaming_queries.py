"""Streaming / incremental queries graded by the harness (SURVEY §2.10).

Each callable still returns a batch DataFrame: streaming queries are driven
to completion with an ``availableNow`` trigger into a memory sink, which is
the deterministic-test shape for micro-batch pipelines (the production
shape swaps the trigger for ``processingTime`` and the sink for the real
one — the plan is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.cursor import incremental_after_cursor, seed_cursor
from ..streaming.dedup import stream_dedup_counts
from ..streaming.outbox import drain_outbox, make_outbox, unposted
from ..streaming.suppression import suppress_alerts
from .registry import register


@register(
    "stream_event_counts",
    """
    SELECT event_type, COUNT(*) AS cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming: watermark + dropDuplicates + agg, availableNow.

    The oracle is the batch equivalent — event_ids are unique, so the
    streaming dedup must be a no-op and the counts must match exactly
    (validates the state plumbing end-to-end).
    """
    return stream_dedup_counts(spark, sf_dir)


@register(
    "cursor_incremental",
    """
    SELECT event_id, event_type
    FROM events
    WHERE event_id > (SELECT MAX(event_id) FROM events WHERE event_type = 'signup')
    """,
)
def cursor_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm cursor: high-water mark from processed rows → pushed-down range
    scan of the remainder (T1/T7; functions.py:19-26,32-38)."""
    events = load_table(spark, sf_dir, "events")
    processed = events.filter(F.col("event_type") == "signup")
    cursor = seed_cursor(events, processed, "event_id")
    return incremental_after_cursor(events, cursor, "event_id").select(
        "event_id", "event_type"
    )


@register(
    "cursor_cold_start",
    """
    SELECT event_id, event_type
    FROM events
    WHERE event_id > (SELECT event_id FROM events
                      ORDER BY event_id DESC LIMIT 1 OFFSET 1)
    """,
)
def cursor_cold_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold start: cursor seeds from the SECOND-newest admitted id so
    exactly the newest item processes first (quirk §4.3.4,
    functions.py:29-30)."""
    events = load_table(spark, sf_dir, "events")
    processed = events.filter(F.lit(False))
    cursor = seed_cursor(events, processed, "event_id")
    return incremental_after_cursor(events, cursor, "event_id").select(
        "event_id", "event_type"
    )


@register(
    "lookback_window",
    """
    SELECT event_id, event_type
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 2 MINUTES
    """,
)
def lookback_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 2-minute lookback window (T6; bot/botrun.py:89-96) anchored at
    the newest event (deterministic stand-in for now())."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("max_ts"))
    return (
        events.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 2 MINUTES"))
        .select("event_id", "event_type")
    )


@register(
    "stream_windowed_counts",
    """
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
           event_type,
           COUNT(*) AS cnt
    FROM events
    GROUP BY w_start, event_type
    ORDER BY w_start, event_type
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark — the
    windowed-agg shape of every streaming dashboard. Spark's epoch-aligned
    ``window()`` buckets equal DuckDB's ``time_bucket``, so the batch
    GROUP BY is an exact oracle. Complete output mode emits every window
    (append would withhold windows inside the lateness horizon when the
    stream ends); at production scale the same query runs append-mode with
    the watermark bounding state."""
    import os as _os

    from ..streaming.dedup import (
        read_events_stream,
        run_available_now,
        state_partitions_for,
    )

    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "cnt",
        )
    )
    nparts = state_partitions_for(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return run_available_now(windowed, spark, "complete", nparts).orderBy(
        "w_start", "event_type"
    )


@register(
    "stream_interval_join",
    """
    SELECT e.user_id AS user_id, e.ts AS error_ts, c.ts AS click_ts
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 60 MINUTE AND e.ts
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks within the hour before each
    error, both sides watermarked (state evicted past watermark+interval —
    the bounded-state contract; see streaming/stream_join.py). availableNow
    over the single-file source emits every inner match in one micro-batch,
    so the batch inequality join is an exact oracle."""
    import os as _os

    from ..streaming.dedup import (
        read_events_stream,
        run_available_now,
        state_partitions_for,
    )
    from ..streaming.stream_join import interval_join_stream

    stream = read_events_stream(spark, sf_dir)
    joined = interval_join_stream(stream, minutes=60)
    nparts = state_partitions_for(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return run_available_now(joined, spark, "append", nparts)


@register(
    "stream_interval_join_outer",
    """
    SELECT e.user_id AS user_id, e.ts AS error_ts, c.ts AS click_ts
    FROM events e LEFT JOIN events c
      ON e.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 60 MINUTE AND e.ts
    WHERE e.event_type = 'error'
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: null-padded rows released
    at watermark close (streaming/stream_join.py outer variant) — the
    late-arriving-enrichment shape ("provably no click preceded this
    error").

    Null rows emit only when the watermark PROVES no match is coming,
    and the engine's eviction threshold lags the ideal one by a batch-
    boundary-dependent margin — so a bounded run is flushed the standard
    way: a far-future SENTINEL event on both sides pushes the watermark
    past every real row's close point, every real error resolves
    (matched or provably unmatched), and the batch LEFT JOIN becomes the
    exact oracle. The sentinel rows themselves are dropped from the
    result (negative user_id).

    r13 perf: the flush instant comes from the events parquet FOOTER
    (driver-side metadata, guide §1/§5 — was a Spark max() job), and the
    2-row sentinel file is written with pyarrow on the driver (was a
    createDataFrame + Spark write job). Any instant ≥ the true max
    flushes correctly — the +30d margin dwarfs footer/micro rounding —
    and the sentinel rows never reach the result, so the query's output
    is bit-identical."""
    import datetime
    import os as _os
    import tempfile as _tf

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.dedup import (
        read_events_stream,
        run_available_now,
        state_partitions_for,
    )
    from ..streaming.stream_join import interval_join_stream_outer

    stream = read_events_stream(spark, sf_dir)
    mx = None
    try:
        md = pq.ParquetFile(_os.path.join(sf_dir, "events.parquet")).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx["ts"]).statistics
            if s is None or not s.has_min_max:
                hi = None
                break
            hi = s.max if hi is None else max(hi, s.max)
        if isinstance(hi, int):  # TIMESTAMP(NANOS) shipped as raw int64
            hi = datetime.datetime.fromtimestamp(
                0, tz=datetime.timezone.utc
            ).replace(tzinfo=None) + datetime.timedelta(microseconds=hi // 1000)
        mx = hi
    except (OSError, KeyError, pa.ArrowInvalid):
        pass
    if mx is None:
        # stat-less footer (or empty/all-NULL ts): fall back to the agg,
        # then to a fixed instant — any value ≥ the true max flushes
        mx = (
            load_table(spark, sf_dir, "events")
            .agg(F.max("ts"))
            .collect()[0][0]
        ) or datetime.datetime(2020, 1, 1)
    if isinstance(mx, datetime.datetime) and mx.tzinfo is not None:
        mx = mx.replace(tzinfo=None)  # session TZ is pinned UTC
    far = mx + datetime.timedelta(days=30)
    sent_dir = _os.path.join(_tf.mkdtemp(prefix="wrtd_outer_sent_"), "s")
    _os.makedirs(sent_dir, exist_ok=True)
    empty = stream.filter(F.lit(False))
    # driver-side 2-row write in the stream's exact post-conversion
    # schema: ts is TIMESTAMP (ltz) → arrow timestamp[us, UTC]; every
    # other column NULL-pads. readStream applies empty.schema explicitly,
    # so only name/type compatibility of the file matters.
    _arrow_t = {
        "bigint": pa.int64(),
        "double": pa.float64(),
        "string": pa.string(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    dtypes = dict(stream.dtypes)
    cols = {}
    for c in stream.columns:
        t = _arrow_t[dtypes[c]]
        if c == "user_id":
            cols[c] = pa.array([-1, -1], type=t)
        elif c == "ts":
            cols[c] = pa.array([far, far], type=t)
        elif c == "event_type":
            cols[c] = pa.array(["error", "click"], type=t)
        else:
            cols[c] = pa.array([None, None], type=t)
    pq.write_table(
        pa.table([cols[c] for c in stream.columns], names=stream.columns),
        _os.path.join(sent_dir, "sentinel.parquet"),
    )
    s2 = spark.readStream.schema(empty.schema).parquet(sent_dir)
    joined = interval_join_stream_outer(
        stream.unionByName(s2), minutes=60, lateness="2 hours"
    )
    out = run_available_now(
        joined,
        spark,
        "append",
        state_partitions_for(spark, _os.path.join(sf_dir, "events.parquet")),
    )
    return out.filter(F.col("user_id") >= 0)


@register("alert_suppression", None)  # sequential chain per key → no SQL oracle
def alert_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hour re-alert suppression per user (T5; bot/botrun.py:250-269).

    The kept set is a per-key sequential chain (each FIRED alert resets the
    window) — genuinely non-SQL-expressible; property-tested in
    tests/test_streaming.py."""
    events = load_table(spark, sf_dir, "events")
    return suppress_alerts(events, hours=8.0, alert_type="error")


@register("outbox_drain", None)  # side-effecting at-least-once sink
def outbox_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outbox lifecycle (T3): materialize per-user JSON docs, drain with the
    null-inclusive ``posted IS NOT TRUE`` poll, flip flags idempotently.

    Returns the outbox after one full drain — every row posted."""
    events = load_table(spark, sf_dir, "events")
    payload = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    outbox = make_outbox(payload, "user_id")
    drained = drain_outbox(outbox, "user_id", send=None)
    return drained.select("user_id", "posted")


@register(
    "stream_session_windows",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows via the BUILT-IN ``session_window``
    (the streaming twin of the batch gaps-and-islands sessionize in
    event_sessions): per-user sessions close after a 30-minute gap, the
    watermark bounds open-session state. Spark defines the session as
    [first_ts, last_ts + gap), exactly the island formulation the DuckDB
    oracle uses — so the comparison pins the built-in operator's gap
    semantics against the hand-rolled one."""
    import os as _os

    from ..streaming.dedup import (
        read_events_stream,
        run_available_now,
        state_partitions_for,
    )

    stream = read_events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    return run_available_now(
        sessions,
        spark,
        "complete",
        state_partitions_for(spark, _os.path.join(sf_dir, "events.parquet")),
    )


@register(
    "stream_trending_types",
    """
    WITH w AS (
        SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
               event_type,
               COUNT(*) AS cnt
        FROM events
        GROUP BY w_start, event_type
    ), r AS (
        SELECT w_start, event_type, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY w_start ORDER BY cnt DESC, event_type
               ) AS rnk
        FROM w
    )
    SELECT w_start, event_type, cnt, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 2
    ORDER BY w_start, rnk
    """,
)
def stream_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: per tumbling window, the top-2 event types by
    count — the 'what is spiking right now' dashboard query. Ranking
    isn't allowed inside a streaming aggregation, so the composition is
    the production shape: the WATERMARKED windowed count runs as the
    stream (bounded state), and the tiny per-window top-k ranks the
    emitted aggregate batch-side (|windows|x|types| rows, a partitioned
    window over an aggregate — never over raw events)."""
    import os as _os

    from pyspark.sql import Window

    from ..streaming.dedup import (
        read_events_stream,
        run_available_now,
        state_partitions_for,
    )

    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "cnt",
        )
    )
    emitted = run_available_now(
        windowed,
        spark,
        "complete",
        state_partitions_for(spark, _os.path.join(sf_dir, "events.parquet")),
    )
    rank_w = Window.partitionBy("w_start").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        emitted.withColumn("rnk", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rnk") <= 2)
    )
