"""As-of (nearest-in-time) join — an operator Spark lacks.

Composed from built-in ops (custom-operator preference (a), no UDF):
tag both inputs, union them on the (key, time) axis, and carry the right
side's payload forward with ``last(..., ignorenulls=True)`` over a
key-partitioned time-ordered window. At equal timestamps the right row
sorts first, giving "at or before" semantics — the same contract as
DuckDB/kdb ASOF JOIN (which serves as the test oracle). ``direction=
"forward"`` and ``tolerance_s`` give the pandas ``merge_asof`` surface
without leaving the single-shuffle plan (forward = backward on the
negated time axis; tolerance = a post-carry projection).

Scale shape: one shuffle on the join key (the window partition); state per
row is O(1). Contrast with the naive inequality join (quadratic per key)
or per-key ``merge_asof`` in pandas (Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_epoch(col: Column, dtype: str) -> Column:
    """Seconds-as-double view of a time axis. TIMESTAMP_NTZ has no direct
    DOUBLE cast — route it through TIMESTAMP (the session TZ is pinned
    UTC throughout the engine, so wall-clock values are unchanged)."""
    if dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row: columns of the matched right row (NULL if none).

    ``direction`` (pandas ``merge_asof`` vocabulary):

    * ``"backward"`` — latest right row with ``right_time <= left_time``;
    * ``"forward"`` — earliest right row with ``right_time >= left_time``
      (implemented as the backward join on negated time — one expression,
      same single-shuffle plan).

    ``tolerance_s`` bounds the match age: a match farther than this many
    seconds from ``left_time`` is nulled out (applied AFTER the carry, so
    it is a projection — no second join).

    ``right`` must be unique per (key, right_time) — pre-aggregate it
    otherwise (ambiguous as-of matches are a data bug, not a join option).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if direction == "forward":
        # negate the time axis: latest(-t) ⇔ earliest(t); timestamps
        # negate via epoch seconds (double keeps sub-second resolution)
        neg_l = f"__neg_{left_time}"
        neg_r = f"__neg_{right_time}"
        lneg = left.withColumn(
            neg_l, -_as_epoch(F.col(left_time), dict(left.dtypes)[left_time])
        )
        rneg = right.withColumn(
            neg_r, -_as_epoch(F.col(right_time), dict(right.dtypes)[right_time])
        )
        out = as_of_join(
            lneg, rneg, key, neg_l, neg_r, payload_cols, "backward", tolerance_s
        )
        return out.drop(neg_l)
    l_tag = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in payload_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn("__rt", F.lit(None).cast("double"))
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        # the matched row's own time rides along for the tolerance check
        _as_epoch(F.col(right_time), dict(right.dtypes)[right_time]).alias("__rt"),
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
    carry = payload_cols + ["__rt"]
    carried = unioned.select(
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            if c in carry
            else F.col(c)
            for c in unioned.columns
        ]
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_s is not None:
        # age on the (possibly negated-double) time axis, in seconds;
        # timestamps cast to double epoch seconds, doubles are no-ops
        stale = F.col("__rt").isNull() | (
            _as_epoch(F.col("__t"), dict(left.dtypes)[left_time]) - F.col("__rt")
            > F.lit(tolerance_s)
        )
        out = out.select(
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                if c in payload_cols
                else F.col(c)
                for c in out.columns
            ]
        )
    return out.drop("__t", "__is_left", "__rt")
