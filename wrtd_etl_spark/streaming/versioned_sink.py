"""Exactly-once streaming APPEND into a versioned table.

The plain-ingestion sibling of streaming/cdc.py's SCD2 fold: every
micro-batch commits one append version of the table
(sources/versioned.py), so downstream readers get snapshot-consistent,
time-travelable ingestion — and incremental consumers get their deltas
for free (``delta_files`` / ``table_changes`` / the incremental
materialized-view refresh all key off exactly these append manifests).

Exactly-once from an at-least-once contract: ``foreachBatch`` can replay
a batch after a crash between our commit and Spark's checkpoint commit;
the manifest records each batch's id, and a replay whose id matches the
latest commit is a no-op (the same ledger pattern as cdc.py, with the
versioned table itself as the ledger — no side channel to drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.versioned import latest_version, manifest_info, write_snapshot


def make_versioned_append_sink(
    table: str,
    stats_cols: list[str] | None = None,
    compact_above: int | None = None,
):
    """The ``foreachBatch`` function: (batch_df, batch_id) → one append
    commit. ``stats_cols`` records per-file min/max on every batch so the
    ingested table is data-skipping-ready from the first commit.

    ``compact_above`` bounds small-file accrual inline: after each
    commit, if the manifest references more than that many files, the
    sink compacts (sources/versioned.maybe_compact) before returning —
    the one-file-set-per-trigger problem solved where it is created.
    Exactly-once is unaffected: the batch-id ledger check reads the
    newest APPEND's extra, and compaction carries ``extra`` forward."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return  # empty trigger: no new version
        prev = latest_version(table)
        if prev is not None:
            info = manifest_info(table)
            if info.get("extra", {}).get("batch_id") == batch_id:
                return  # replayed delivery: already committed
        write_snapshot(
            batch,
            table,
            mode="overwrite" if prev is None else "append",
            extra={"batch_id": batch_id},
            stats_cols=stats_cols,
        )
        if compact_above is not None:
            from ..sources.versioned import maybe_compact

            maybe_compact(
                batch.sparkSession,
                table,
                max_files=compact_above,
                # rewrite to half the trigger threshold so steady-state
                # appends breathe between compactions instead of
                # re-triggering on the very next batch
                target_files=max(1, compact_above // 2),
                stats_cols=stats_cols,
            )

    return sink


def run_versioned_append_stream(
    stream: DataFrame,
    table: str,
    checkpoint: str,
    stats_cols: list[str] | None = None,
) -> None:
    """Drive a (bounded) stream to completion, one append version per
    micro-batch."""
    q = (
        stream.writeStream.foreachBatch(
            make_versioned_append_sink(table, stats_cols)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
