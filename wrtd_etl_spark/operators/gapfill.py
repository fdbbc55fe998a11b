"""Time-series gap-fill: densify a per-key series and carry values forward.

The hypertable/rollup idiom (TimescaleDB ``time_bucket_gapfill`` +
``locf``): aggregate facts to one row per (key, bucket), then materialize
the MISSING buckets so every key has a continuous series, filling each
gap with the last observed value. Dashboards, rate computations and
training-data freshness monitors all assume gapless series; a naive
per-key loop is the classic driver-side anti-pattern this module avoids.

Spark-first shape (100 TB lens):

* the expensive input is the FACT aggregation (one exchange on
  (key, bucket) with map-side partial agg) — exactly the cost of the
  plain rollup; gap-fill adds work proportional to the AGGREGATED series
  (keys × buckets), not the facts;
* the scaffold is ``sequence(min_bucket, max_bucket, interval)`` +
  ``explode`` per key — generated distributively from the per-key span
  row, no driver loop, no cross join against a calendar table;
* the fill is ``last(value, ignorenulls=True)`` over a window
  PARTITIONED BY KEY and ordered by bucket — bounded per-key state,
  never a global window (the plan-shape rule the repo enforces).

Carry-forward (LOCF) only: leading NULLs (bucket before the key's first
observation) cannot occur because each key's scaffold starts at its own
first observed bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    daily: DataFrame,
    key_col: str,
    date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Densify ``daily`` (one row per (key, date)) to a gapless per-key
    calendar, carrying each value column forward across gaps.

    Returns (key, date, *value_cols filled, was_gap). ``daily`` must
    already be aggregated — this operator's scaffold and window scale
    with keys × days, so feed it the rollup, not the fact table.
    """
    # two consumers (the span agg and the join's probe side) would each
    # recompute the upstream fact aggregation — materialize the DAILY
    # table once (keys x days rows, the small side by construction; same
    # checkpoint-over-cache rationale as the minhash signature table)
    daily = daily.localCheckpoint(eager=False)
    span = daily.groupBy(key_col).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    scaffold = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr("INTERVAL 1 DAY"))
        ).alias(date_col),
    )
    joined = scaffold.join(daily, [key_col, date_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # was_gap keys off the FIRST value column's observedness; callers
    # with semantically-independent value columns pass them separately
    probe = F.col(value_cols[0])
    out = joined.withColumn("was_gap", probe.isNull())
    for v in value_cols:
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out
