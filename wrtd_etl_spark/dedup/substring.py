"""Substring-level duplication: repeated token windows ACROSS documents.

Whole-document dedup (exact/MinHash/SimHash) misses the dominant
real-world pattern: distinct documents sharing long verbatim passages —
boilerplate headers, licenses, quoted chain-mail. Lee et al.,
"Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) remove repeated substrings directly; the exact
suffix-array construction is a single-machine algorithm, so this module
implements the standard distributed approximation: fingerprint a sliding
token window at a fixed stride and mark every window whose fingerprint
occurs in ≥ ``min_docs`` distinct documents.

Scale shape (100 TB lens):

* the window explode emits ~n_tokens/stride rows per doc — linear in the
  corpus, tunable by ``stride``;
* one exchange groups fingerprints (map-side combined count of distinct
  docs via the (hash, doc) pre-dedup), producing the tiny duplicated-hash
  set; the mark-back join is a LEFT SEMI against that set (AQE
  broadcasts it when small — which is exactly when dedup is healthy);
* fingerprints are md5 over the joined window text — engine-portable,
  which is what lets the registered query be hash-verified against
  DuckDB (xxhash64 would be faster but engine-specific; swap via
  ``fingerprint_fn`` for production).

Window semantics: positions are 1-based at ``stride`` spacing; documents
shorter than ``window`` contribute their whole text as one window (both
engines slice-to-available identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def window_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    stride: int = 2,
) -> DataFrame:
    """(id, pos, h): md5 fingerprint of each stride-spaced token window."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pos = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1)), F.lit(stride)
    )
    span = F.transform(
        pos,
        lambda p: F.struct(
            p.alias("pos"),
            F.md5(
                F.encode(F.concat_ws(" ", F.slice(toks, p, window)), "UTF-8")
            ).alias("h"),
        ),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(span).alias("s"))
        .select(id_col, "s.pos", "s.h")
    )


def _dup_hash_set(spans: DataFrame, id_col: str, min_docs: int) -> DataFrame:
    """Fingerprints occurring in ≥ min_docs DISTINCT docs (tiny by
    construction in a healthy corpus — the semi-join broadcasts)."""
    return (
        spans.select("h", id_col)
        .distinct()  # per-doc repeats of a window count once
        .groupBy("h")
        .agg(F.count("*").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("h")
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    stride: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """(id, pos, h) for every window whose fingerprint appears in
    ≥ ``min_docs`` DISTINCT documents — the spans a substring-level
    cleaner would cut (or a contamination auditor would flag)."""
    spans = window_fingerprints(df, text_col, id_col, window, stride)
    return spans.join(_dup_hash_set(spans, id_col, min_docs), "h", "left_semi")


def substring_dup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    stride: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplication profile: total windows, windows shared
    with other docs, and the shared fraction — the gating signal for
    span-level cleaning (docs at frac≈1 are whole-doc dups; mid-range
    docs carry boilerplate)."""
    # three consumers of the exploded window table (hash counts, the
    # semi-join probe side, per-doc totals) — materialize the explode
    # once, same rationale as the minhash signature checkpoint
    spans = window_fingerprints(
        df, text_col, id_col, window, stride
    ).localCheckpoint(eager=False)
    dup = spans.join(_dup_hash_set(spans, id_col, min_docs), "h", "left_semi")
    totals = spans.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    dups = dup.groupBy(id_col).agg(F.count("*").alias("n_dup_spans"))
    return (
        totals.join(dups, id_col, "left")
        .withColumn("n_dup_spans", F.coalesce("n_dup_spans", F.lit(0)))
        .withColumn(
            "dup_frac",
            F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
        )
    )
