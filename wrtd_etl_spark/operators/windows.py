"""Window operators (SURVEY.md §2.6, W1).

The reference's only window is ``DENSE_RANK() OVER (ORDER BY COUNT(...)
DESC)`` with no PARTITION BY (queries.py:11,20) — a global window. A global
window forces every row through one partition, which is fine for
per-replay cardinality but a scale hazard. :func:`dense_rank_top_k`
therefore pre-aggregates first (shrinking the data to one row per group)
and only then applies the single-partition window to the — now tiny —
aggregate, which is the 100-TB-safe shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_rank_top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_col: Column,
    agg_alias: str,
    k: int,
    tiebreaker: str | None = None,
    rank_alias: str = "rnk",
) -> DataFrame:
    """groupBy → count → global dense_rank → top-k (W1 + O2).

    Reference: queries.py:11-17 ("cutlets") and 20-26 ("tks"). The
    reference's ``ORDER BY rank LIMIT 5`` cuts rank ties arbitrarily; we add
    a deterministic tiebreaker column (documented divergence, SURVEY §4.3.2)
    so results are stable and oracle-comparable.

    dense_rank is cast to long so the schema matches SQL engines (DuckDB /
    Postgres return BIGINT ranks; Spark's native is int).
    """
    agg = df.groupBy(*group_cols).agg(agg_col.alias(agg_alias))
    w = Window.orderBy(F.desc(agg_alias))
    ranked = agg.withColumn(rank_alias, F.dense_rank().over(w).cast("long"))
    order = [F.col(rank_alias).asc()]
    if tiebreaker:
        order.append(F.col(tiebreaker).asc())
    return ranked.orderBy(*order).limit(k)
