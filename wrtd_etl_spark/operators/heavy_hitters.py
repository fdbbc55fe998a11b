"""Exact frequency-threshold heavy hitters without a full-key shuffle.

"Which tokens make up ≥ φ of the corpus" over 100 TB of text has a key
cardinality (the vocabulary) that makes the naive
``groupBy(token).count()`` shuffle the single dominant cost — and
almost all of those keys are light. The two-pass sketch-then-verify
pattern keeps the answer EXACT while shuffling only candidates:

1. **Misra-Gries per partition** (``mapInPandas``): each partition
   keeps at most ``k = ceil(1/phi) + 1`` counters; the classic
   deficiency bound guarantees any item with partition frequency
   ≥ n_p/k survives its partition's summary. An item with GLOBAL
   frequency ≥ φ·n has frequency ≥ φ·n_p on at least one partition
   (pigeonhole over the partition sizes), so the union of summaries is
   a SUPERSET of every true heavy hitter. Only
   (#partitions × k) candidate rows ever shuffle.
2. **Exact verification**: one aggregation of the stream restricted to
   the (broadcast) candidate set — true counts, false positives
   filtered by the threshold. Output counts are exact, so a plain SQL
   ``GROUP BY … HAVING count >= ceil(phi*n)`` is the oracle.

The same shape is the standard scalable answer for trending-terms,
hot-key diagnosis (operators/skew.py decides WHETHER to salt; this
finds WHICH keys), and vocabulary pruning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(col: str, k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    return run


def heavy_hitters(
    df: DataFrame, col: str, phi: float
) -> DataFrame:
    """(value, cnt) for every non-null value with frequency ≥ φ of the
    non-null rows — exact counts, candidate-only shuffle."""
    if not 0 < phi <= 1:
        raise ValueError(f"phi must be in (0, 1]: {phi}")
    # The documented contract is EXACT boundary semantics: cnt >= phi*n.
    # ceil(phi*n) in double excludes a value sitting exactly on the
    # boundary whenever phi*n picks up a 1-ulp excess (0.01*300 →
    # 3.0000000000000004 → ceil 4, wrongly dropping cnt=3). Recover the
    # rational phi from its decimal spelling and compare in pure integer
    # arithmetic: cnt*den >= num*n. Denominator capped at 1e6 so the
    # products stay far inside BIGINT even at 100-TB row counts (~1e13).
    from fractions import Fraction

    frac = Fraction(str(phi)).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    if num == 0:
        # phi below the rational resolution would make the threshold
        # vacuous (cnt*den >= 0); such a phi also means >1e6 Misra-Gries
        # counters per partition — refuse loudly rather than mis-filter
        raise ValueError(
            f"phi={phi} is below the 1e-6 exact-threshold resolution"
        )
    k = math.ceil(1 / phi) + 1
    vals = df.select(col).filter(F.col(col).isNotNull())
    candidates = (
        vals.mapInPandas(
            _mg_partition(col, k), vals.schema
        ).distinct()
    )
    verified = (
        vals.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = vals.agg(F.count(F.lit(1)).alias("__n"))
    return (
        verified.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(den) >= F.lit(num) * F.col("__n"))
        .select(col, "cnt")
    )
