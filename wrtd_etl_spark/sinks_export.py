"""Token-budget sharded JSONL export: the training-data delivery step.

A pre-training run wants the corpus as JSONL shards of roughly equal
TOKEN count (not row count — docs vary 100×), so data-loader workers
stream shards without coordination. The naive route — sort globally,
collect counts to the driver, assign shards — dies first at 100 TB;
this operator derives the shard id entirely on the cluster:

1. one pass computes each doc's inclusive running token total in a
   deterministic global order (``operators/prefix_sum.distributed_cumsum``
   — two window passes + a ReusedExchange, no driver state);
2. ``shard = floor((cumsum - tokens) / target)`` — the shard a doc
   STARTS in, so every shard's total is < target + one document (the
   bin-packing bound; pinned in tests);
3. one ``partitionBy(shard)`` JSONL write: each shard is a directory of
   line-delimited JSON parts, written executor-parallel.

A driver-side manifest (shard → rows, tokens) is written last from the
per-shard AGGREGATE (shard-count rows cross the driver, never docs),
using the same tmp+``os.replace`` commit idiom as sources/versioned.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.prefix_sum import distributed_cumsum

MANIFEST = "_manifest.json"


def assign_token_shards(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    bucket_col: str,
    target_tokens: int,
    out_col: str = "shard",
) -> DataFrame:
    """Input rows + ``out_col``: contiguous shard ids in the global
    ``(bucket_col, *order_cols)`` order, each shard's token total
    < target_tokens + max(token_col)."""
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    cum = distributed_cumsum(
        df, token_col, order_cols, bucket_col, out_col="__cum"
    )
    return cum.withColumn(
        out_col,
        F.floor((F.col("__cum") - F.col(token_col)) / F.lit(target_tokens)).cast(
            "long"
        ),
    ).drop("__cum")


def write_sharded_jsonl(
    df: DataFrame,
    path: str,
    token_col: str,
    order_cols: list[str],
    bucket_col: str,
    target_tokens: int,
) -> dict:
    """Write ``path/shard=N/*.json`` JSONL shards plus a manifest;
    returns the manifest dict (shards → {rows, tokens})."""
    sharded = assign_token_shards(
        df, token_col, order_cols, bucket_col, target_tokens
    )
    # repartition on the shard id so each shard is written by one task
    # (contiguous files, no tiny parts); shard count is data-derived.
    # persist across the write and the manifest aggregate — without it
    # the two actions each rerun the full prefix-sum pipeline
    sharded = sharded.repartition("shard").persist()
    sharded.write.partitionBy("shard").json(path)
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(token_col).alias("tokens"),
        )
        .collect()
    )
    manifest = {
        "target_tokens": target_tokens,
        "shards": {
            str(r["shard"]): {"rows": r["rows"], "tokens": r["tokens"]}
            for r in sorted(stats, key=lambda r: r["shard"])
        },
    }
    mpath = os.path.join(path, MANIFEST)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    sharded.unpersist()
    return manifest
