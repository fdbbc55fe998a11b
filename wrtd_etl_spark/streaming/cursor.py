"""Incremental cursor source (T1/T2, T7).

Reference: functions.py:12-40 — the 5-minute DAG reads a high-water mark
(`current_replay` Airflow Variable), scans the listing for ids above it,
and cold-starts from the *second*-newest admitted entry (functions.py:30 —
a deliberate quirk: exactly the newest replay gets processed on first run).

Spark shape: the cursor is a plain max() aggregate over already-processed
keys; new work = pushed-down ``id > cursor`` filter; idempotency =
left_anti against processed keys (T7, functions.py:79-86). At scale, the
filter prunes parquet row groups via min/max stats — no full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seed_cursor(
    admitted: DataFrame, processed: DataFrame, id_col: str
) -> DataFrame:
    """1-row DataFrame with the cursor value (column ``cursor``).

    * If anything was processed: cursor = max processed id
      (functions.py:19-26 — latest posted replay).
    * Cold start: cursor = the SECOND-newest admitted id, so exactly the
      newest item is new (functions.py:29-30, preserved quirk §4.3.4).
    """
    has_processed = processed.agg(F.max(id_col).alias("max_done"))
    w = Window.orderBy(F.desc(id_col))
    second_newest = (
        admitted.select(F.col(id_col))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .select(F.col(id_col).alias("seed"))
    )
    return has_processed.crossJoin(
        F.broadcast(second_newest.agg(F.max("seed").alias("seed")))
    ).select(F.coalesce(F.col("max_done"), F.col("seed")).alias("cursor"))


def incremental_after_cursor(
    source: DataFrame, cursor: DataFrame, id_col: str
) -> DataFrame:
    """Rows of ``source`` strictly above the cursor (P7).

    The 1-row cursor is broadcast; the comparison is a pushed-down range
    predicate after Catalyst folds the join, so row-group pruning applies.
    """
    return source.crossJoin(F.broadcast(cursor)).filter(
        F.col(id_col) > F.col("cursor")
    ).drop("cursor")


def dedup_against_processed(
    incoming: DataFrame, processed: DataFrame, key: str
) -> DataFrame:
    """Idempotent re-processing guard (T7): drop already-loaded keys.

    Reference: functions.py:79-86 pulls ALL ids and compares in a Python
    loop; the Spark shape is a left_anti join (no driver collect)."""
    return incoming.join(processed.select(key), on=key, how="left_anti")
