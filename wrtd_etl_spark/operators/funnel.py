"""Ordered-funnel analysis: first time each user reaches step i AFTER
reaching step i-1.

The classic product-analytics query (view → click → purchase). Naive
formulations self-join the raw event table N times on (user, ts-range);
this operator keeps every stage keyed on the USER:

* step 1 is a filtered min-aggregate (map-side combined);
* step i is a min-aggregate over events of type i joined to the step
  i-1 frontier on the user key with ``ts > t_{i-1}``.

Every join and aggregate shuffles on the same user key, so Catalyst
reuses one hash-partitioning across all stages, and each stage's input
is the TYPE-FILTERED slice of the scan (predicate pushed to parquet),
never the full event stream. State per user is one timestamp per step —
at 100 TB the frontier table is |users| × N timestamps, many orders of
magnitude smaller than the events.

Strict ordering: each step must be STRICTLY after the previous (ties do
not advance the funnel), matching the window-function formulation the
oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user who completed step 1: ``t_1 .. t_N`` (nullable
    beyond the furthest step) and ``steps_completed``."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        frontier = (
            frontier.join(nxt, user_col, "left")
            .withColumn(
                "__ok",
                F.when(
                    F.col("__ts") > F.col(f"t_{i - 1}"), F.col("__ts")
                ),
            )
            .groupBy(user_col, *[f"t_{j}" for j in range(1, i)])
            .agg(F.min("__ok").alias(f"t_{i}"))
        )
    completed = sum(
        F.col(f"t_{i}").isNotNull().cast("int") for i in range(1, len(steps) + 1)
    )
    return frontier.withColumn("steps_completed", completed.cast("long"))
