"""Sharded JSONL export (sinks_export.py): budget bound, losslessness,
manifest accuracy."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.functions.text import token_count
from wrtd_etl_spark.sinks_export import (
    MANIFEST,
    assign_token_shards,
    write_sharded_jsonl,
)


def _docs(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            "text",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            (F.col("doc_id") % 8).alias("bkt"),
        )
        .filter(F.col("n_tokens").isNotNull())
    )


def test_shard_budget_bound_and_contiguity(spark):
    docs = _docs(spark)
    target = 2000
    sharded = assign_token_shards(docs, "n_tokens", ["doc_id"], "bkt", target)
    rows = sharded.collect()
    max_doc = max(r.n_tokens for r in rows)
    per_shard: dict[int, int] = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + r.n_tokens
    assert len(per_shard) > 1, "target too large to exercise sharding"
    for s, tot in per_shard.items():
        assert tot < target + max_doc, (s, tot)
    # shard ids are contiguous 0..K
    assert sorted(per_shard) == list(range(len(per_shard)))
    # every shard except possibly the last is at least target-full:
    # a doc that STARTS in shard s pushes its cumsum past s*target
    for s, tot in per_shard.items():
        if s != max(per_shard):
            assert tot + max_doc >= target


def test_write_sharded_jsonl_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "export")
    manifest = write_sharded_jsonl(
        docs, out, "n_tokens", ["doc_id"], "bkt", target_tokens=3000
    )
    with open(os.path.join(out, MANIFEST)) as f:
        assert json.load(f) == manifest
    back = spark.read.json(os.path.join(out, "shard=*"))
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    assert sum(s["tokens"] for s in manifest["shards"].values()) == sum(
        r.n_tokens for r in docs.collect()
    )
    # one JSONL part per shard (the repartition-by-shard contract)
    for s in manifest["shards"]:
        parts = [
            p
            for p in os.listdir(os.path.join(out, f"shard={s}"))
            if p.endswith(".json")
        ]
        assert len(parts) == 1, (s, parts)
