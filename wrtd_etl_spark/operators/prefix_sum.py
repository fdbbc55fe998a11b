"""Distributed running sum over a global order (scalable prefix sum).

The naive form — ``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``
with no PARTITION BY — collapses the whole table into ONE window task,
exactly the global-window-over-raw-facts anti-pattern the plan-shape
tests forbid. The classic two-pass construction keeps it distributed:

1. within-bucket running sums (window partitioned by a range bucket that
   is MONOTONE in the global order, so bucket order == global order);
2. per-bucket totals → exclusive running offsets (a window over
   n_buckets rows — bounded driver-side-scale data, not the fact table);
3. broadcast the offsets back and add.

Cost at 100 TB: one exchange on the bucket key + one tiny broadcast; the
fact table is never globally sorted on a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    bucket_col: str,
    out_col: str = "cumsum",
) -> DataFrame:
    """Input rows + ``out_col`` = inclusive running sum of ``value_col``
    in the global order ``(bucket_col, *order_cols)``.

    ``bucket_col`` must be monotone in the intended global order (i.e. it
    IS a range partitioning of the leading order column) — callers derive
    it arithmetically, e.g. ``key DIV (key_space / n_buckets)``.
    """
    # Pre-filter the (never legitimately NULL) bucket key: the final join
    # would push an isnotnull filter into ONE branch only, making the two
    # otherwise-identical Exchange subtrees non-canonical and defeating
    # exchange reuse — with the filter shared, Catalyst plans the totals
    # branch as a ReusedExchange of the window's shuffle.
    df = df.filter(F.col(bucket_col).isNotNull())
    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn("__local", F.sum(value_col).over(w_in))
    # Bucket totals = the running sum at the LAST row of each bucket
    # (max_by on the order key), which is the true bucket total for any
    # sign of value_col — NOT max of the running sum, which only equals
    # the total when values are non-negative. Aggregating __local (not
    # value_col) keeps the window in the totals subtree so the
    # aggregate's required hash partitioning matches the window's and
    # Catalyst plans a ReusedExchange instead of scanning and exchanging
    # the fact table twice (verified in the plan test).
    totals = local.groupBy(bucket_col).agg(
        F.max_by("__local", F.struct(*order_cols)).alias("__tot")
    )
    # exclusive prefix over the bucket totals: n_buckets rows, a bounded
    # single-task window by construction (NOT over the fact table)
    w_off = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        bucket_col,
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), bucket_col)
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__local", "__off")
    )
