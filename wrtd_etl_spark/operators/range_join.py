"""Point-in-interval range join via time bucketization.

Spark has no native range join (the Databricks runtime's range-join hint
is not in OSS); the naive formulation — equi-join on the entity key plus
range predicates — degenerates to a per-key cross product when keys are
hot. The scalable construction:

1. pick a bucket width >= the maximum interval length;
2. each interval replicates to every bucket it overlaps (<= 2 replicas
   when width >= max interval length);
3. each point lands in exactly ONE bucket, so the equi-join on
   (key, bucket) plus the residual range filter yields each matching
   (point, interval) pair exactly once — no dedup pass needed.

Cost: shuffle on (key, bucket) — bounded fan-out, no quadratic blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col):
    # timestamp_ntz has no direct long cast; session TZ is pinned UTC
    return F.col(col).cast("timestamp").cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` joined to every interval of the same ``key``
    with ``start <= t < end``. ``bucket_seconds`` must be >= the maximum
    interval length (asserted per row at plan level via the replica
    sequence, which would explode otherwise).

    Only ``inner`` is supported: the residual range filter runs AFTER the
    join, so any outer mode's unmatched rows (NULL interval columns) would
    be silently dropped by the filter — an outer mode here degenerates to
    inner and is rejected rather than pretending to work.
    """
    if how != "inner":
        raise ValueError(
            f"range_join supports only how='inner' (got {how!r}): the "
            "post-join range filter drops outer-mode NULL rows"
        )
    p = points.withColumn(
        "__bucket", F.floor(_epoch(point_time) / bucket_seconds)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(start_col) / bucket_seconds),
                F.floor((_epoch(end_col) - 1) / bucket_seconds),
            )
        ),
    )
    joined = p.join(i, on=[key, "__bucket"], how=how).filter(
        (_epoch(point_time) >= _epoch(start_col))
        & (_epoch(point_time) < _epoch(end_col))
    )
    return joined.drop("__bucket")
