"""Table digest + keyed table diff: migration verification primitives.

Moving 100 TB between engines (the whole premise of this repo) ends
with one question: is the copy EXACTLY the source? Sorting both sides
to compare is its own 100-TB shuffle; these two operators answer it
with aggregation-shaped plans:

``table_digest``
    Order-independent content fingerprint: per-row ``xxhash64`` over
    the chosen columns, combined with the commutative-associative pair
    (XOR, unsigned-wrapping SUM) plus the row count. Any partitioning
    or row order yields the same digest (property-tested via
    ``repartition``); any single-row change flips it. One scan,
    map-side combined, a 3-number result. Digests are engine-specific
    (xxhash64 seed), so equality is meaningful between two SPARK tables
    — the cross-engine check is ``table_diff`` below.

``table_diff``
    Keyed reconciliation: full outer join on the key, null-safe
    comparison of the tracked columns — emits only ``added`` /
    ``removed`` / ``changed`` rows (the empty result IS the equality
    proof, and it's SQL-expressible, so DuckDB oracles the operator
    directly). One co-partitioned join; at scale both sides bucket by
    the same key so the join is shuffle-light, and the output is
    |differences|, not |table|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_digest(df: DataFrame, cols: list[str] | None = None) -> dict:
    """{'n', 'xor', 'sum'} — equal dicts ⇔ equal multisets of rows (up
    to xxhash64 collisions) regardless of order or partitioning."""
    cols = cols or df.columns
    h = F.xxhash64(*[F.col(c) for c in cols])
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(h).alias("xor"),
        # second independent combine: SUM of a 20-bit residue. The
        # modulus bounds the accumulator at 2^20 * rows, so the BIGINT
        # sum cannot overflow (ANSI would raise, non-ANSI would wrap
        # silently) below ~8.7e12 rows — far past any single table here
        F.sum(h % F.lit(2**20)).alias("lo"),
    ).first()
    return {"n": row["n"], "xor": row["xor"], "sum": row["lo"]}


def _any_changed(cols: list[str]) -> Column:
    cond = F.lit(False)
    for c in cols:
        cond = cond | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
    return cond


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., change) with change ∈ {added, removed, changed}:
    ``added`` = key only in ``b``, ``removed`` = only in ``a``,
    ``changed`` = present in both with any tracked column differing
    (null-safe). Unchanged rows are never emitted."""
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in key_cols]
    left = a.select(
        *key_cols,
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
    )
    right = b.select(
        *key_cols,
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
    )
    joined = left.join(right, key_cols, "full")
    change = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(_any_changed(compare_cols), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
