"""Skew-aware join: salting for hot keys.

AQE's skew-join handles sort-merge skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.RUNTIME_CONFS),
but salting is still the tool when the skew is in an AGGREGATION or the
join strategy is hash-partitioned by a framework outside AQE's reach.

Construction: the fact side gets a random-but-deterministic salt in
[0, n_salts) appended to the key; the dimension side is exploded n_salts
times (one replica per salt). The join key becomes (key, salt) so one hot
key spreads over n_salts partitions. Results are identical to the unsalted
join (verified in tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the hot-key load spread over ``n_salts``
    partitions. The salt is a deterministic hash of the whole fact row
    (xxhash64 of all columns) — stable across retries, unlike rand().

    Only ``inner``/``left`` are supported: the dim side is replicated
    ``n_salts`` times, so right/full modes would emit each unmatched dim
    row once per salt replica — rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): the "
            "exploded dim emits unmatched rows n_salts times in right/full"
        )
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, on=[key, "__salt"], how=how).drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase skewed aggregation: count by (key, salt) map-side, then
    re-aggregate by key — the classic hot-key groupBy fix."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))
