"""``foreachBatch`` side-effecting sink — the K6/T3 streaming twin.

Reference: bot/botrun.py:295-309 polls unposted rows once a minute, sends
to Discord, then flips flags. The Structured Streaming production shape
is ``foreachBatch``: Spark hands each micro-batch (with its epoch id) to
a driver-side callback, and the checkpoint WAL makes batch delivery
resumable — restarting the query re-offers only unprocessed batches.

Delivery contract (same as the batch drain in streaming/outbox.py):
at-least-once. The send runs BEFORE the batch commit, so a crash between
send and commit re-delivers that batch's rows on restart; consumers dedup
on the idempotency key. The epoch id is the dedup unit Spark itself
tracks — a sender that records ``epoch_id`` can skip replayed batches
entirely (exactly-once for idempotent sinks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def send_stream(
    events: DataFrame,
    send: Callable[[int, list], None],
    checkpoint_dir: str,
):
    """Start an availableNow ``foreachBatch`` sender over a streaming frame.

    ``send(epoch_id, rows)`` is invoked per non-empty micro-batch on the
    driver (batches are bounded by the source's files-per-trigger, the
    same boundedness argument as the batch outbox drain). Returns the
    StreamingQuery; callers ``awaitTermination()``.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        if rows:
            send(epoch_id, rows)

    return (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
