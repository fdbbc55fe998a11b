"""As-of (most-recent-at-or-before) join — an operator Spark lacks.

Composed from built-in ops (custom-operator preference (a), no UDF):
tag both inputs, union them on the (key, time) axis, and carry the right
side's payload forward with ``last(..., ignorenulls=True)`` over a
key-partitioned time-ordered window. At equal timestamps the right row
sorts first, giving "at or before" semantics — the same contract as
DuckDB/kdb ASOF JOIN (which serves as the test oracle).

Scale shape: one shuffle on the join key (the window partition); state per
row is O(1). Contrast with the naive inequality join (quadratic per key)
or per-key ``merge_asof`` in pandas (Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_time <= left_time`` and the same ``key`` (NULL if none).

    ``right`` must be unique per (key, right_time) — pre-aggregate it
    otherwise (ambiguous as-of matches are a data bug, not a join option).
    """
    l_tag = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in payload_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c) for c in payload_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.select(l_tag.columns).unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            if c in payload_cols
            else F.col(c)
            for c in unioned.columns
        ]
    )
    return carried.filter(F.col("__is_left") == 1).drop("__t", "__is_left")
