"""Equi-width histogram: one scan, one tiny shuffle of bucket counts.

The warehouse primitive behind every distribution dashboard and every
skew diagnosis (the SHUFFLE_AUDIT skew column reports max/median task
input — this operator is how you find WHICH key range is heavy before
a 100× run). ``width_bucket`` is evaluated in the scan stage, so the
only shuffle is ``n_buckets + 2`` partial counts (map-side combined);
under- and overflow land in buckets 0 and ``n_buckets + 1``, matching
the SQL-standard ``width_bucket`` contract that Spark and DuckDB share.

With ``bounds=None`` a first min/max pass (one scan, two floats to the
driver) fixes the range — use explicit bounds in incremental settings
so bucket edges stay stable across batches (the same reason the SQ8
scales and the IVF centroids are trained once and persisted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(bucket, lo, hi, n): dense 1..n_buckets rows (zero-count buckets
    included) plus under/overflow rows 0 and n_buckets+1 when hit."""
    if bounds is None:
        row = df.agg(
            F.min(col).cast("double"), F.max(col).cast("double")
        ).first()
        bounds = (row[0], row[1])
    lo, hi = float(bounds[0]), float(bounds[1])
    if not hi > lo:
        raise ValueError(f"degenerate histogram bounds: [{lo}, {hi}]")
    width = (hi - lo) / n_buckets
    # explicit width_bucket arithmetic (identical IEEE ops in any engine,
    # so the DuckDB oracle can mirror it literally): under/overflow land
    # in buckets 0 and n+1 per the SQL-standard contract
    x = F.col(col).cast("double")
    bucket = (
        F.when(x < F.lit(lo), F.lit(0))
        .when(x >= F.lit(hi), F.lit(n_buckets + 1))
        .otherwise(
            F.floor((x - F.lit(lo)) / F.lit(width)) + F.lit(1)
        )
    ).cast("long")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    scaffold = spark.range(1, n_buckets + 1).select(
        F.col("id").alias("bucket")
    )
    dense = scaffold.join(counts, "bucket", "full").select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)).alias("lo"),
        (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("hi"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    return dense
