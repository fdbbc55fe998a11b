"""Streaming temporal enrichment: events joined AS-OF a slowly-changing
dimension, exactly-once into a versioned output.

The batch half of this story already exists — ``temporal_dim_join``
(operators/scd2.py) answers "which dimension VERSION was valid at this
fact's time". Streams need the same join continuously, against a
dimension that keeps changing underneath (the CDC fold, streaming/
cdc.py, commits new dim versions while events flow). The composition:

    readStream → foreachBatch(
        dim = read_snapshot(dim_table)      # manifest-pinned, torn-free
        out = temporal_dim_join(batch, dim) # AS-OF the event's own time
        write_snapshot(out, mode='append', extra={batch_id, dim_version})
    )

Three properties fall out of the parts already verified elsewhere:

* **consistent dim reads** — the snapshot read pins one manifest, so a
  batch never sees a half-committed dim version (sources/versioned.py);
* **exactly-once output** — the manifest-extra batch-id ledger makes a
  replayed micro-batch a no-op (same pattern as versioned_sink.py);
* **lineage** — every output version records WHICH dim version enriched
  it, so any batch's join is reproducible by time travel on both sides.

Scale shape: per batch, one keyed equi-join (dimension broadcast — an
SCD2 dim is keys × versions, small by construction; pass
``broadcast_dim=False`` for a genuinely huge dimension and let AQE
decide) plus the append commit. No state store: the dimension table IS
the state, which is exactly what makes it inspectable and replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scd2 import temporal_dim_join
from ..sources.versioned import (
    latest_version,
    manifest_info,
    read_snapshot,
    write_snapshot,
)


def make_temporal_enrich_sink(
    dim_table: str,
    out_table: str,
    fact_key: str,
    dim_key: str,
    fact_time: str,
    broadcast_dim: bool = True,
):
    """foreachBatch function: (batch_df, batch_id) → one committed
    version of ``out_table`` holding the batch AS-OF-enriched against
    the CURRENT dim snapshot. Replays (at-least-once foreachBatch) are
    detected via the manifest batch-id ledger and skipped."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return  # empty trigger: no new version
        prev = latest_version(out_table)
        last = (
            manifest_info(out_table).get("extra", {}).get("batch_id")
            if prev is not None
            else None
        )
        if last == batch_id and prev is not None:
            return  # replayed micro-batch: already committed
        spark = batch_df.sparkSession
        dim_version = latest_version(dim_table)
        dim = read_snapshot(spark, dim_table, version=dim_version)
        if broadcast_dim:
            dim = F.broadcast(dim)
        # drop the DIM side's key by column reference — a name-based
        # .drop(dim_key) removes BOTH columns when fact_key == dim_key
        # (the common case), silently committing a keyless output table
        enriched = temporal_dim_join(
            batch_df, dim, fact_key, dim_key, fact_time
        ).drop(dim[dim_key])
        write_snapshot(
            enriched,
            out_table,
            mode="overwrite" if prev is None else "append",
            extra={"batch_id": batch_id, "dim_version": dim_version},
        )

    return fold


def enrich_stream(
    stream: DataFrame,
    dim_table: str,
    out_table: str,
    fact_key: str,
    dim_key: str,
    fact_time: str,
    checkpoint: str,
    broadcast_dim: bool = True,
):
    """Wire the sink to a stream with an availableNow trigger; returns
    the started query (callers await/stop it)."""
    return (
        stream.writeStream.foreachBatch(
            make_temporal_enrich_sink(
                dim_table,
                out_table,
                fact_key,
                dim_key,
                fact_time,
                broadcast_dim,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
