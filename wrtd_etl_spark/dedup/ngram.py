"""Character n-gram Jaccard similarity join via an inverted index.

The similarity join no Spark builtin provides, composed from relational
ops (SURVEY.md §2 custom-operator rule (a)):

1. distinct character n-grams per doc (array expr → explode = postings);
2. document-frequency cutoff: drop n-grams appearing in more than
   ``max_df`` docs — they contribute little to Jaccard but dominate the
   pair-enumeration cost (the classic inverted-index pruning for 100 TB);
3. group postings by n-gram, enumerate doc pairs per gram, count shared
   grams per pair;
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
    projection, not a groupBy over the (much larger) exploded postings.
    Candidate pairs are enumerated from the grouped postings list (one
    groupBy on ``g``), which makes the document-frequency cutoff a FREE
    ``size(ids)`` filter on the same aggregate — the earlier
    doc_freq-groupBy + prune-join + postings-self-join form paid three
    more exchanges of the widest table for the same pair set. Remaining
    exchanges: the postings groupBy on ``g``, the pair groupBy, and the
    two key-equi size joins on the aggregated pairs (AQE picks the
    strategy; the pair side is the small one after thresholding).

    The gram-array table feeds two consumers (sizes, postings) —
    materialized once via localCheckpoint: plain row blocks, because
    ``.persist()`` routes array columns through the columnar cache
    builder's generic per-element encoder (measured slower than
    recomputing at sf0.1). On a cluster: a reliable checkpoint/temp table,
    same plan shape.
    """
    from ..catalog import spread

    # NULL text must be unmatchable, not a bucket: char_ngrams(NULL)
    # evaluates to [NULL] (greatest(NULL,1)=1 keeps one window whose
    # substring is NULL), so without this filter every NULL-text doc
    # shares a NULL gram with every other and they all pair at jaccard
    # 1.0. Pushed-down IsNotNull at the scan.
    df = df.filter(F.col(text_col).isNotNull())
    # shingling is CPU-bound: guarantee the gram stage sees full
    # parallelism even when the scan is a single small file (no-op on a
    # real multi-split 100 TB scan)
    arr = spread(df).select(
        F.col(id_col), char_ngrams(F.col(text_col), n).alias("__arr")
    )
    if persist:
        arr = arr.localCheckpoint(eager=False)
    sizes = arr.select(F.col(id_col), F.size("__arr").alias("sz"))
    pos = arr.select(F.col(id_col), F.explode("__arr").alias("g"))
    # Document-frequency pruning BEFORE the postings lists materialize: a
    # boilerplate gram shared by most of the corpus must never reach
    # collect_list (one giant non-spillable aggregation buffer).
    if max_df is not None:
        # DF prune as a WINDOW count over the gram (r14, the fuzzy.py r13
        # idiom; guide §2.4): the former count-aggregate + broadcast
        # anti-join scanned the postings twice and planned an extra
        # exchange + broadcast build; the window hash-partitions by g
        # once and the collect_list groupBy below REUSES it. Identical
        # prune set (window count ≡ group count); a boilerplate gram
        # spills in the window sort instead of growing an agg buffer.
        # Interleaved A/B at sf0.1 (dedup_clusters): 2.52 → 1.77 s.
        from pyspark.sql import Window

        _w = Window.partitionBy("g")
        pos = (
            pos.withColumn("__df", F.count(F.lit(1)).over(_w))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    grouped = pos.groupBy("g").agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    grouped = grouped.filter(F.size("ids") >= 2)
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    shared = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.id1", "p.id2")
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
