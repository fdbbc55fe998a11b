"""Streaming CDC → SCD2: fold each micro-batch into a versioned history.

The reference's poll loop is exactly this pipeline done by hand: fetch
new rows since the cursor (T1/T2, streaming/cursor.py), upsert the
latest value into Postgres (functions.py:178-183). The Spark-native
form composes the three operators this repo already verifies:

    readStream → foreachBatch(
        scd2_merge(read_snapshot(table), batch) → write_snapshot(table))

Every micro-batch becomes one COMMITTED VERSION of the dimension table
(sources/versioned.py), so the warehouse can time-travel to the state
after any batch — the reference's in-place upsert keeps none of this.

Per-batch cost is the scd2_merge shape: closed history passes through
untouched, the open rows join only the batch's keys. The version read
inside foreachBatch is pinned to a manifest, so a concurrent reader
never observes a half-applied batch (single-writer contract,
sources/versioned.py).

Batch-order contract: micro-batches must arrive in fact-time order
(Spark guarantees per-source ordering for file sources under
``maxFilesPerTrigger`` by listing order; an out-of-order CDC feed needs
an upstream watermark-sort, the same requirement the reference's cursor
poll imposes). The fold≡rebuild equivalence is property-tested batch by
batch in tests/test_cdc_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd2 import scd2_from_changelog, scd2_merge
from ..sources.versioned import (
    latest_version,
    manifest_info,
    read_snapshot,
    write_snapshot,
)


def make_scd2_batch_folder(
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    tracked_cols: list[str],
):
    """The ``foreachBatch`` function: (batch_df, batch_id) → commits one
    new version of ``table``. First batch bootstraps the history.

    ``foreachBatch`` is AT-LEAST-ONCE: a crash between our
    ``write_snapshot`` commit and Spark's checkpoint commit replays the
    batch on restart, and re-folding the same rows would close each open
    row at a valid_from EARLIER than its own — inverted intervals,
    committed into exactly the history this module promises is
    consistent. The versioned table is its own idempotence ledger: every
    fold records its ``batch_id`` in the manifest, and a replay whose id
    matches the latest commit is a no-op (the foreach_sink.py epoch-id
    pattern, with the manifest playing the role of the epoch marker)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return  # empty trigger: no new version
        spark = batch.sparkSession
        if latest_version(table) is None:
            hist = scd2_from_changelog(
                batch, key_cols, order_cols, tracked_cols
            )
        else:
            info = manifest_info(table)
            if info.get("extra", {}).get("batch_id") == batch_id:
                return  # replayed batch: already committed, skip the fold
            hist = scd2_merge(
                read_snapshot(spark, table),
                batch,
                key_cols,
                order_cols,
                tracked_cols,
            )
        write_snapshot(hist, table, extra={"batch_id": batch_id})

    return fold


def run_cdc_scd2_stream(
    stream: DataFrame,
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    tracked_cols: list[str],
    checkpoint: str,
) -> None:
    """Drive a (bounded) CDC stream to completion, committing one table
    version per micro-batch."""
    q = (
        stream.writeStream.foreachBatch(
            make_scd2_batch_folder(table, key_cols, order_cols, tracked_cols)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
