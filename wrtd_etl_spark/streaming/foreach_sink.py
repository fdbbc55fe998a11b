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


def make_resilient_sender(
    send: Callable[[int, object], None],
    dlq_dir: str,
    max_attempts: int = 3,
    backoff_s: float = 0.1,
    sleeper: Callable[[float], None] | None = None,
):
    """Wrap a per-row ``send(epoch_id, row)`` with bounded exponential
    backoff and a dead-letter queue — the failure half the reference's
    poll loop handles with a bare except (bot/botrun.py): a transient
    send error must retry, a poison row must NOT wedge the stream.

    Rows that still fail after ``max_attempts`` are appended to
    ``dlq_dir/epoch=<id>.jsonl`` (one file per micro-batch — atomic via
    tmp+rename, readable back with ``spark.read.json`` for replay) with
    the last error attached; delivery of the REST of the batch
    continues. ``sleeper`` is injectable so tests don't sleep.

    Returns a batch sender compatible with :func:`send_stream`'s
    ``send`` argument. At-least-once semantics are unchanged — the DLQ
    only narrows redelivery to genuinely undeliverable rows."""
    import json
    import os
    import time

    do_sleep = sleeper if sleeper is not None else time.sleep

    def resilient(epoch_id: int, rows: list) -> None:
        dead = []
        for row in rows:
            err = None
            for attempt in range(max_attempts):
                try:
                    send(epoch_id, row)
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 - DLQ is the handler
                    err = e
                    if attempt + 1 < max_attempts:
                        do_sleep(backoff_s * (2**attempt))
            if err is not None:
                dead.append((row, err))
        if dead:
            os.makedirs(dlq_dir, exist_ok=True)
            path = os.path.join(dlq_dir, f"epoch={epoch_id}.jsonl")
            with open(path + ".tmp", "w") as f:
                for row, err in dead:
                    doc = {k: str(v) for k, v in row.asDict().items()}
                    doc["__error"] = f"{type(err).__name__}: {err}"
                    doc["__epoch_id"] = epoch_id
                    f.write(json.dumps(doc) + "\n")
            os.replace(path + ".tmp", path)

    return resilient
