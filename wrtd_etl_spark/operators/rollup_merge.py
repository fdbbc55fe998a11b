"""Incremental aggregate maintenance: fold a delta batch into a rollup.

The reference's whole pipeline is incremental (cursor loads — T1/T2), but
its aggregates are recomputed from the full table each poll; at 100 TB a
rollup over all history cannot be rescanned per batch. The standard fix
is maintaining the rollup as MERGEABLE PARTIAL AGGREGATES: keep
(count, sum, min, max) per group, aggregate only the new batch, and merge
old + delta group-wise:

    count' = count + count_delta        min' = least(min, min_delta)
    sum'   = sum + sum_delta            max' = greatest(max, max_delta)

Derived metrics (avg = sum/count, …) are computed AT READ TIME from the
maintained components — storing avg directly would make the state
non-mergeable, the classic incremental-aggregation mistake.

Cost per batch: one aggregation of the DELTA (map-side combined) + one
outer join against the rollup keyed on the group — both scale with the
batch and the number of LIVE groups, never with history. Pairs with
``upsert_parquet`` for the swap-persisted state table; equivalence to
full recomputation is property-tested (merge of any split == aggregate
of the whole).

Sums over doubles use the engine's exact-integer idiom upstream if the
rollup is oracle-compared; this operator itself is agnostic — it merges
whatever mergeable columns it is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metric name -> (delta aggregator, merge expression builder)
_MERGES = {
    "count": (
        lambda c: F.count(c),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda a, b: (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(a + b)
        ),
    ),
    "min": (lambda c: F.min(c), lambda a, b: F.least(a, b)),
    "max": (lambda c: F.max(c), lambda a, b: F.greatest(a, b)),
    # distinct counts CAN be maintained incrementally — as a mergeable
    # HLL sketch (Apache DataSketches via the built-in hll_* functions),
    # the one aggregate the count/sum/min/max component set can't
    # express. State per group is the ~KB sketch; read the estimate at
    # query time with estimate_distinct() (same read-time rule as avg).
    # plain row count per group (count(*) semantics, NULL-key safe) —
    # the liveness component retractable CDC folds need: a group whose
    # __rows hits 0 after retraction is DEAD and leaves the rollup,
    # which a count(col) can't prove (it skips NULLs)
    "rows": (
        lambda c: F.count(F.lit(1)),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    "distinct": (
        lambda c: F.hll_sketch_agg(c),
        lambda a, b: (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(F.hll_union(a, b))
        ),
    ),
}


def estimate_distinct(col) -> "F.Column":
    """Read-time estimate for a 'distinct'-kind rollup column (~2% HLL
    error at the default lgK)."""
    return F.hll_sketch_estimate(col)


def aggregate_batch(
    batch: DataFrame, keys: list[str], metrics: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial aggregate of one batch: ``metrics`` maps output column →
    (kind, source column), kind ∈ {count, sum, min, max}."""
    aggs = []
    for out, (kind, src) in metrics.items():
        if kind not in _MERGES:
            raise ValueError(f"non-mergeable aggregate kind: {kind!r}")
        aggs.append(_MERGES[kind][0](F.col(src)).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def _null_safe_key_join(
    left: DataFrame, right: DataFrame, keys: list[str], how: str
) -> DataFrame:
    """Join on the group keys with NULL-SAFE equality (``<=>``): a NULL
    group key is a real group (SQL GROUP BY treats all NULLs as one
    group), but a plain equi-join never matches NULL = NULL — so a
    name-list join would land the NULL-key old and delta rows as two
    separate rows (full_outer) or silently retract nothing (left).
    Right-side keys are pre-renamed to ``__r_<k>``; callers coalesce
    them back when the join is outer."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__r_{k}"))
    return left.join(r, cond, how)


def merge_rollup(
    rollup: DataFrame,
    delta_rollup: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merged rollup: groups from either side survive, shared groups
    combine component-wise. Both inputs must be in ``aggregate_batch``
    form (same keys + metric columns)."""
    old = rollup.select(
        *keys, *[F.col(m).alias(f"__o_{m}") for m in metrics]
    )
    new = delta_rollup.select(
        *keys, *[F.col(m).alias(f"__d_{m}") for m in metrics]
    )
    merged = _null_safe_key_join(old, new, keys, "full_outer")
    # unmatched sides hold NULL keys from the outer join; the matched
    # side's value (NULL-safe equal, so identical) fills them back in
    for k in keys:
        merged = merged.withColumn(
            k, F.coalesce(F.col(k), F.col(f"__r_{k}"))
        )
    for out, (kind, _) in metrics.items():
        merged = merged.withColumn(
            out, _MERGES[kind][1](F.col(f"__o_{out}"), F.col(f"__d_{out}"))
        )
    return merged.select(*keys, *metrics.keys())


#: aggregate kinds whose partials can be SUBTRACTED exactly — the
#: precondition for folding a change feed's deletes (min/max/distinct
#: are not retractable: removing the current min says nothing about the
#: next one without a rescan)
RETRACTABLE = {"count", "sum", "rows"}


def retract_rollup(
    rollup: DataFrame,
    deleted_rollup: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """Rollup minus the partial aggregates of DELETED rows — the
    retraction half of CDC-fold maintenance. Every metric kind must be
    in RETRACTABLE; groups whose ``rows``-kind component reaches 0 are
    dropped (the group no longer exists — keeping a zeroed row would
    diverge from a rebuild). Float sums retract with float arithmetic:
    exactly inverse in the integer-sum idiom, subject to the usual
    drift otherwise."""
    bad = [k for k, (kind, _) in metrics.items() if kind not in RETRACTABLE]
    if bad:
        raise ValueError(f"non-retractable metric(s): {bad}")
    dels = deleted_rollup.select(
        *keys, *[F.col(m).alias(f"__d_{m}") for m in metrics]
    )
    # NULL-safe: deletions of the NULL-key group must find their row
    out = _null_safe_key_join(rollup, dels, keys, "left")
    rows_cols = [m for m, (kind, _) in metrics.items() if kind == "rows"]
    for name, (kind, _) in metrics.items():
        d = F.col(f"__d_{name}")
        if kind in ("count", "rows"):
            expr = F.col(name) - F.coalesce(d, F.lit(0))
        else:  # sum: NULL-safe (an all-NULL deleted slice subtracts 0)
            expr = F.when(d.isNull(), F.col(name)).otherwise(
                F.col(name) - d
            )
        out = out.withColumn(name, expr)
    for rc in rows_cols:
        out = out.filter(F.col(rc) > 0)
    return out.select(*keys, *metrics.keys())
