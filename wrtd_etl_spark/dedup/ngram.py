"""Character n-gram Jaccard similarity join via an inverted index.

The similarity join no Spark builtin provides, composed from relational
ops (SURVEY.md §2 custom-operator rule (a)):

1. distinct character n-grams per doc (array expr → explode = postings);
2. document-frequency cutoff: drop n-grams appearing in more than
   ``max_df`` docs — they contribute little to Jaccard but dominate the
   self-join cost (the classic inverted-index pruning for 100 TB);
3. postings self-join on the n-gram → shared-gram counts per pair;
4. Jaccard = shared / (|A| + |B| - shared), threshold filter.

Fully SQL-expressible → has a DuckDB oracle in plans/pipeline_queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(text: Column, n: int) -> Column:
    """Distinct character n-grams of the lowercased text (array column)."""
    t = F.lower(text)
    ln = F.length(t)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1))),
            lambda i: F.substring(t, i, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Pairs (id1 < id2) with n-gram Jaccard >= threshold.

    Shuffle budget (the 100 TB lens): per-doc set sizes come from
    ``F.size`` on the gram ARRAY before the explode — a scan-stage
    projection, not a groupBy over the (much larger) exploded postings —
    and join the small POST-aggregation pair table, so the wide self-join
    rows stay narrow (g, id1, id2 only). Remaining exchanges: the
    document-frequency groupBy on ``g``, the df-prune join on ``g`` (whose
    output partitioning the self-join reuses), the pair groupBy, and the
    two key-equi size joins on the aggregated pairs (AQE picks the
    strategy; the pair side is the small one after thresholding).

    The persisted gram-array table feeds three consumers (sizes, document
    frequencies, the pair join); without persistence each one re-derives
    the n-grams from raw text — Catalyst has no cross-action subplan
    reuse. At cluster scale it would be a checkpointed table; locally
    MEMORY_AND_DISK persistence serves the same role.
    """
    from ..catalog import spread

    # shingling is CPU-bound: guarantee the gram stage sees full
    # parallelism even when the scan is a single small file (no-op on a
    # real multi-split 100 TB scan)
    arr = spread(df).select(
        F.col(id_col), char_ngrams(F.col(text_col), n).alias("__arr")
    )
    if persist:
        from pyspark import StorageLevel

        # persist the per-doc ARRAY (one row per doc), not the exploded
        # postings: the array form is ~n× smaller in the cache, and
        # re-exploding from memory is a pure codegen pass — measured
        # faster than caching the postings themselves at sf0.1
        arr = arr.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = arr.select(F.col(id_col), F.size("__arr").alias("sz"))
    pos = arr.select(F.col(id_col), F.explode("__arr").alias("g"))
    if max_df is not None:
        # postings are distinct per doc (array_distinct) → count(*) = df
        doc_freq = pos.groupBy("g").agg(F.count("*").alias("df"))
        pos = pos.join(doc_freq.filter(F.col("df") <= max_df), "g")
    left = pos.select("g", F.col(id_col).alias("id1"))
    right = pos.select("g", F.col(id_col).alias("id2"))
    shared = (
        left.join(right, "g")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared"))
    )
    # sizes has one row per doc — NOT broadcastable at corpus scale; the
    # candidate-pair side is the small one after aggregation, so let AQE
    # pick the strategy for these key-equi joins.
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("sz").alias("sz2"))
    return (
        shared.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "shared", "jaccard")
    )
