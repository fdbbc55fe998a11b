"""applyInPandasWithState: the streaming suppression twin must agree with
the batch implementation on the same data."""

from __future__ import annotations

from wrtd_etl_spark.streaming.dedup import read_events_stream, run_available_now
from wrtd_etl_spark.streaming.suppression import suppress_alerts, suppress_alerts_stream

from .conftest import SF_SMOKE


def test_stream_suppression_agrees_with_batch(spark):
    from wrtd_etl_spark.catalog import load_table

    stream = read_events_stream(spark, SF_SMOKE)
    result = run_available_now(
        suppress_alerts_stream(stream, hours=8.0), spark, "append"
    )
    got = {(r.user_id, r.ts, r.alert_rank) for r in result.collect()}

    batch = suppress_alerts(load_table(spark, SF_SMOKE, "events"), hours=8.0)
    want = {(r.user_id, r.ts, r.alert_rank) for r in batch.collect()}
    assert got == want
    assert len(want) > 0
