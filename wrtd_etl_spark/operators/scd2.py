"""Type-2 slowly-changing dimension: history build + incremental merge.

The reference maintains dimensions by in-place upsert (``ON CONFLICT DO
UPDATE`` — functions.py:178-183), which keeps only the LATEST value; any
query that asks "what was this row worth when the fact happened" cannot
be answered. The warehouse-standard fix is SCD type 2: every change
becomes a validity interval ``[valid_from, valid_to)`` and the open row
(``valid_to IS NULL``) is the current value.

Two entry points:

``scd2_from_changelog``
    Full history rebuild from an ordered changelog. One shuffle on the
    key; the change-point filter and the interval close are two window
    functions over the SAME (partition, order) spec, so Catalyst reuses
    one exchange + one sort — at 100 TB this is a single keyed
    repartition of the changelog, no self-join, no driver state.
    Consecutive rows with identical tracked values collapse into one
    version (null-safe comparison, so NULL→NULL is "no change").

``scd2_merge``
    Incremental maintenance: fold a NEW changelog slice into an existing
    SCD2 table without rescanning closed history. Closed rows pass
    through untouched (at scale: the partition-pruned cold path); only
    the open rows join the batch's per-key FIRST version — a keyed join
    whose size is (live keys ∩ batch keys), never |history|. The
    cross-boundary collapse rule matches the rebuild: if a key's first
    batch version carries the same tracked values as its open row, that
    batch version is dropped and the open row absorbs its interval.
    Property-pinned: folding any time-split of the changelog batch by
    batch equals one full rebuild (tests/test_scd2.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(tracked: list[str], prev_prefix: str) -> Column:
    """Null-safe "any tracked column differs from its __prev twin"."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(c).eqNullSafe(F.col(f"{prev_prefix}{c}"))
    return cond


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tracked_cols: list[str],
    valid_col: str | None = None,
) -> DataFrame:
    """SCD2 history from a changelog: one row per (key, version) with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    ``order_cols`` must be a deterministic total order within each key
    (include a tiebreaker id); ``valid_col`` (default ``order_cols[0]``)
    is the column whose value becomes the interval bound."""
    valid_col = valid_col or order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    with_prev = df.select(
        *key_cols,
        *order_cols,
        *[c for c in tracked_cols if c not in order_cols],
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in tracked_cols],
        F.row_number().over(w).alias("__rn"),
    )
    change_points = with_prev.filter(
        (F.col("__rn") == 1) | _changed(tracked_cols, "__prev_")
    )
    # same (partition, order) spec -> exchange + sort reused by Catalyst
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    valid_to = F.lead(valid_col).over(w2)
    return change_points.select(
        *key_cols,
        *tracked_cols,
        F.col(valid_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tracked_cols: list[str],
    valid_col: str | None = None,
) -> DataFrame:
    """Fold a changelog ``batch`` into an existing SCD2 ``current`` table.

    Every row of ``batch`` must order strictly after the open rows it
    touches (the incremental contract — same as the reference's cursor
    loads, streaming/cursor.py). Closed rows are untouched."""
    valid_col = valid_col or order_cols[0]
    batch_hist = scd2_from_changelog(
        batch, key_cols, order_cols, tracked_cols, valid_col
    )

    w = Window.partitionBy(*key_cols).orderBy("valid_from")
    first_flag = batch_hist.withColumn(
        "__first", F.row_number().over(w) == 1
    )
    firsts = first_flag.filter("__first").select(
        *key_cols,
        *[F.col(c).alias(f"__b_{c}") for c in tracked_cols],
        F.col("valid_from").alias("__b_from"),
        F.col("valid_to").alias("__b_to"),
    )

    closed = current.filter(~F.col("is_current"))
    open_rows = current.filter("is_current")

    # open row vs the batch's first version for the same key:
    #   no batch rows  -> unchanged (left join miss)
    #   same tracked   -> absorb: open row takes that version's interval
    #   differs        -> close at the batch version's valid_from
    joined = open_rows.join(firsts, key_cols, "left")
    absorbed = ~_changed(tracked_cols, "__b_")
    adjusted_open = joined.select(
        *key_cols,
        *tracked_cols,
        "valid_from",
        F.when(F.col("__b_from").isNull(), F.lit(None).cast(
            joined.schema["valid_to"].dataType
        ))
        .when(absorbed, F.col("__b_to"))
        .otherwise(F.col("__b_from"))
        .alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())

    # batch versions minus the absorbed firsts
    batch_out = (
        first_flag.join(
            open_rows.select(
                *key_cols,
                *[F.col(c).alias(f"__o_{c}") for c in tracked_cols],
                F.lit(True).alias("__had_open"),
            ),
            key_cols,
            "left",
        )
        .filter(
            ~(
                F.col("__first")
                & F.coalesce(F.col("__had_open"), F.lit(False))
                & ~_changed(tracked_cols, "__o_")
            )
        )
        .select(*key_cols, *tracked_cols, "valid_from", "valid_to", "is_current")
    )
    out_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to", "is_current"]
    return (
        closed.select(*out_cols)
        .unionByName(adjusted_open.select(*out_cols))
        .unionByName(batch_out)
    )


def temporal_dim_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_time,
    how: str = "left",
) -> DataFrame:
    """Each fact row joined to the dimension VERSION valid at its time
    (the AS OF read an SCD2 table exists for): key equi-join first, then
    the half-open interval predicate ``valid_from <= t < valid_to``
    (open row: ``valid_to IS NULL``).

    Scale shape: the only shuffle is the keyed equi-join (broadcast when
    the dimension is small); fan-out before the interval filter is the
    per-key VERSION count — a few rows, never |facts| x |dim|. Facts
    before a key's first version (or unmatched keys) survive with NULL
    dimension columns under ``how='left'``."""
    t = F.col(fact_time) if isinstance(fact_time, str) else fact_time
    in_interval = (t >= F.col("valid_from")) & (
        F.col("valid_to").isNull() | (t < F.col("valid_to"))
    )
    if how == "inner":
        return facts.join(
            dim, (facts[fact_key] == dim[dim_key]) & in_interval, "inner"
        )
    if how != "left":
        raise ValueError(f"unsupported how: {how!r}")
    return facts.join(
        dim, (facts[fact_key] == dim[dim_key]) & in_interval, "left"
    )
