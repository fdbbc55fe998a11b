"""Upsert / merge without a transactional table format (SURVEY.md K3/K5).

Reference: functions.py:178-183 — ``INSERT INTO d_players ... ON CONFLICT
(id_from_json) DO UPDATE SET nickname = EXCLUDED.nickname``.

Vanilla parquet has no MERGE, so the idiomatic Spark decomposition is
``updates ∪ (current ▷ updates)`` — new rows win, untouched rows survive via
an anti-join. For persistence, :func:`upsert_parquet` writes to a temp dir
and swaps (atomic-enough for a single writer; a real deployment would use
Delta/Iceberg MERGE INTO — gated behind an import-try since those jars are
not in this image).

Scale notes: the updates side of a dimension upsert is typically small →
broadcast the anti-join; the full dimension is never shuffled.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_by_key(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``current`` (K3).

    Equivalent to Postgres INSERT ... ON CONFLICT DO UPDATE: the update row
    wins on key collision, other rows are untouched.
    """
    kept = current.join(
        F.broadcast(updates.select(key)), on=key, how="left_anti"
    )
    return updates.unionByName(kept)


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """Persisted upsert with write-temp-then-swap (K3/K5 on parquet).

    Parquet is immutable, so the merged table is materialized next to the
    target and renamed into place. Single-writer only — concurrent writers
    need a transactional format (Delta MERGE INTO).
    """
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = upsert_by_key(current, updates, key)
    else:
        merged = updates
    tmp = f"{path}.__tmp_{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def delete_by_key(current: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """Rows of ``current`` whose key appears in ``keys`` are removed.

    The GDPR/right-to-erasure primitive a training-data store needs next
    to upsert: one broadcast anti-join (the delete-key set is small
    relative to the corpus), the fact side never shuffles.
    """
    return current.join(F.broadcast(keys.select(key)), on=key, how="left_anti")


def delete_parquet(
    spark: SparkSession, path: str, keys: DataFrame, key: str
) -> None:
    """Persisted keyed delete with the same write-temp-then-swap contract
    as :func:`upsert_parquet` (single-writer; Delta/Iceberg DELETE at
    production scale)."""
    current = spark.read.parquet(path)
    remaining = delete_by_key(current, keys, key)
    tmp = f"{path}.__tmp_{uuid.uuid4().hex}"
    remaining.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
