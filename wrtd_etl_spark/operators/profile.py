"""Single-pass column profiling: nulls / distincts / min / max per column.

The reference has no profiling step at all — schema drift in its sources
surfaces as a crashed poll (main.py's bare try/except). A warehouse
needs the DuckDB-``SUMMARIZE`` equivalent as an operator: one row per
column with row count, null count, distinct count and min/max, computed
WITHOUT one scan per column.

Shape: every metric for every column is folded into ONE ``agg`` over the
table — a single scan with map-side partial aggregation — and the 1-row
wide result is unpivoted driver-free via ``explode(array(struct(...)))``
(the 1×C unpivot is trivially cheap; the scan is the only real cost).

Distinct counts:

* ``exact=True`` uses ``count(distinct c)`` per column. Spark plans
  multi-column distincts with an Expand node (rows × columns before the
  shuffle) — fine at audit scale, the wrong default at 100 TB.
* ``exact=False`` (the scale path) uses ``approx_count_distinct`` (HLL,
  ~2% error): no Expand, fully map-side combinable, one reduce of
  C sketches. The oracle-compared query pins the exact mode; the approx
  mode is error-bound-tested against it.

min/max are cast to strings so heterogeneous columns share one schema —
callers that need typed extremes profile one column at a time. Columns
whose string rendering differs across engines (double/timestamp) are the
caller's responsibility to pre-format; the shipped query profiles
bigint/string/date columns, whose casts agree between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column, one scan total."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        distinct = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn{i}"),
            distinct.alias(f"__nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx{i}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn{i}")).alias("n_nulls"),
                F.col(f"__nd{i}").alias("n_distinct"),
                F.col(f"__mn{i}").alias("min_value"),
                F.col(f"__mx{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
