"""Streaming observability: observe() metrics + watermark-drop capture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Observation
from pyspark.sql import functions as F

from wrtd_etl_spark.streaming.metrics import ProgressCapture, observe


def test_observe_batch_with_observation(spark):
    """The same metric dict instruments a BATCH frame via Observation."""
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "k long, v string"
    )
    obs = Observation("m")
    out = observe(
        df,
        obs,
        {"rows": F.count(F.lit(1)), "null_v": F.count(F.when(F.col("v").isNull(), 1))},
    )
    assert out.count() == 3
    assert obs.get == {"rows": 3, "null_v": 1}


def _arrive(spark, watch: str, rows: list[tuple[int, dt.datetime]]) -> None:
    spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(watch)


def test_watermark_drop_and_observed_metrics_capture(spark, tmp_path):
    """A late row arriving after the checkpointed watermark passed it is
    dropped by the stateful agg — ProgressCapture must surface BOTH the
    engine's numRowsDroppedByWatermark and our observed pre-agg counter
    for the same batch."""
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    base = dt.datetime(2024, 1, 1, 10, 0)

    def run_once() -> str:
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(
            watch
        )
        instrumented = observe(
            stream,
            "ingest",
            {
                "rows": F.count(F.lit(1)),
                "before_ten": F.count(
                    F.when(F.col("ts") < F.lit(base), 1)
                ),
            },
        )
        counts = (
            instrumented.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "15 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            counts.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return str(q.id)

    # run 1: on-time events 10:00..10:30 -> watermark commits at 10:20
    _arrive(
        spark,
        watch,
        [(i, base + dt.timedelta(minutes=10 * i)) for i in range(4)],
    )
    with ProgressCapture(spark) as cap1:
        qid1 = run_once()
    assert cap1.observed_total("ingest", "rows") == 4
    assert cap1.total_dropped_by_watermark() == 0
    # query-scoped readout: this query's id sees the same totals, a
    # foreign id sees none (the listener is session-global)
    assert cap1.observed_total("ingest", "rows", query_id=qid1) == 4
    assert cap1.observed_total("ingest", "rows", query_id="no-such-id") == 0

    # run 2: one VERY late event (09:00, an hour behind the committed
    # watermark) plus one fresh event
    _arrive(
        spark,
        watch,
        [
            (100, base - dt.timedelta(hours=1)),
            (101, base + dt.timedelta(minutes=40)),
        ],
    )
    with ProgressCapture(spark) as cap2:
        qid2 = run_once()
    assert cap2.observed_total("ingest", "rows") == 2
    assert cap2.total_dropped_by_watermark(query_id=qid2) == 1
    assert cap2.observed_total("ingest", "before_ten") == 1
    assert cap2.total_dropped_by_watermark() == 1
    # the capture records per-batch watermarks for operators to alert on
    assert any(b.watermark for b in cap2.batches)
