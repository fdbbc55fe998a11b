"""Exact deduplication: hash-groupBy on a normalized text fingerprint.

Scale shape: one shuffle on a uniformly-distributed 128-bit key (md5), so
there is no skew by construction; the min() per group is a map-side partial
aggregate. This is the linear-cost baseline every near-dup method sits on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized text: (fp, keep_id, cnt).

    ``keep_id`` = smallest id in the group (the canonical survivor).
    """
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("cnt"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (the min-id one) per distinct normalized text.

    Implemented as a semi-join against the survivor set rather than a
    window, so the full rows are never sorted — only (fp,id) pairs shuffle.
    """
    keep = exact_dup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")
