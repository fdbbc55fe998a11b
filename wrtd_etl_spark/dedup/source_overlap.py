"""Corpus-overlap analytics: pairwise Jaccard similarity BETWEEN sources.

Training-mixture hygiene question the per-document dedup modules don't
answer: how much does source A's content overlap source B's (mirrored
crawls, shared boilerplate, cross-posted corpora)? Computed over each
source's distinct token-shingle SET, so it is set-Jaccard between
corpora, not document matching.

Two paths:

* ``source_jaccard_exact`` — inverted-index self-join on the distinct
  (source, shingle) table. Exact and SQL-expressible (the DuckDB oracle
  runs the same algebra on the same string shingles). Scale shape: the
  distinct-shingle table is the only large intermediate; a shingle seen
  in s sources contributes C(s,2) ≤ C(|sources|,2) pair rows — bounded
  by the (tiny) source count, never by corpus size, so the join cannot
  go quadratic in documents the way document-level all-pairs would.
* ``source_jaccard_minhash`` — per-source MinHash signature, the
  100 TB path: ONE aggregation over the corpus (component-wise min of
  per-document signatures — valid because min over a union is the min
  of the mins), then pairwise estimation on a |sources|×num_hashes
  frame that fits anywhere. Standard MinHash error ~1/sqrt(num_hashes).

Reference parity: extends the corpus-composition reporting surface
(mixture/profile) the way SURVEY §2.12's dedup family extends document
dedup; no reference operator computes cross-source overlap — this is
part of the added LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import minhash_signatures, shingles


def _distinct_source_shingles(
    df: DataFrame, text_col: str, source_col: str, shingle_k: int
) -> DataFrame:
    """(source, sh): each source's distinct shingle set, one hash shuffle."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(source_col).alias("source"),
            F.explode(shingles(F.col(text_col), shingle_k)).alias("sh"),
        )
        .distinct()
    )


def source_jaccard_exact(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    shingle_k: int = 3,
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_common, jaccard) for every
    unordered source pair (source_a < source_b), including zero-overlap
    pairs — a silent inner-join would hide exactly the disjoint pairs a
    mixture report wants to confirm."""
    sh = _distinct_source_shingles(df, text_col, source_col, shingle_k)
    # localCheckpoint would be overkill: both consumers reuse the same
    # shuffle output (exchange reuse), the scan runs once
    counts = sh.groupBy("source").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    pairs = (
        ca.join(cb, F.col("ca.source") < F.col("cb.source"))
        .select(
            F.col("ca.source").alias("source_a"),
            F.col("cb.source").alias("source_b"),
            F.col("ca.n").alias("n_a"),
            F.col("cb.n").alias("n_b"),
        )
    )
    return (
        pairs.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            (
                F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_common"), F.lit(0))).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def source_jaccard_minhash(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(source_a, source_b, est_jaccard): MinHash estimate of the exact
    path, with the corpus reduced in ONE groupBy — the component-wise
    min of per-document signatures IS the source's signature over its
    shingle union. Everything after the aggregation is |sources|-sized."""
    sigs = minhash_signatures(
        df.select(id_col, text_col),
        text_col,
        id_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
        seed=seed,
    ).join(
        df.select(id_col, F.col(source_col).alias("source")), id_col
    )
    # (source, pos, min component) — num_hashes rows per source
    comp = (
        sigs.select("source", F.posexplode("sig").alias("pos", "v"))
        .groupBy("source", "pos")
        .agg(F.min("v").alias("v"))
    )
    a, b = comp.alias("a"), comp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.avg(
                F.when(F.col("a.v") == F.col("b.v"), 1.0).otherwise(0.0)
            ).alias("est_jaccard")
        )
        .orderBy("source_a", "source_b")
    )
