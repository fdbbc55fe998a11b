"""Corpus mixture sampling: hit per-source token targets deterministically.

Every production corpus is a weighted MIXTURE of sources (web, code,
reference, dialogue, …) with target proportions set by data strategy, not
by how much of each source happens to exist. This operator downsamples
each source to its token budget:

    frac(source) = min(1, weight(source) * token_budget / tokens(source))

keeping a document iff its deterministic hash-uniform falls below its
source's fraction — the same engine-portable multiplicative-hash idiom as
``dataset_split`` (no rand(): reruns, retries, and other engines agree on
every kept id, and the realized sample is unbiased w.r.t. document order).

Scale shape: one map-side-combinable aggregate for per-source token
totals (rows = #sources), broadcast back onto the corpus scan, one
filter — the corpus is never shuffled. Expected tokens kept per source =
min(target, available); sources under budget pass through whole (frac
capped at 1), a shortfall is reported, not silently re-balanced — at
100 TB you re-weight deliberately, not implicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash → uniform in [0, 1): the engine-portable
# deterministic sampler (pure integer arithmetic + one exact division)
_HASH_MOD = 4294967296


def _hash_uniform(id_col: Column) -> Column:
    from .sampling import hash32

    # hash32 == (id*2654435761) mod 2^32 for every id, via a split
    # multiply that cannot overflow long under ANSI mode (full-range
    # 64-bit ids would blow the naive product past 2^63)
    return hash32(id_col).cast("double") / F.lit(float(_HASH_MOD))


def mixture_sample(
    df: DataFrame,
    weight_col: Column,
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Rows of ``df`` kept by the mixture, plus ``__frac`` (the source's
    sampling fraction) and ``__n_tokens`` (the document's token count).

    ``weight_col`` is an expression giving each row's source weight
    (typically a CASE/map over ``source_col``); weights should sum to ~1
    across sources but are used only via ``weight * token_budget``.
    """
    from ..functions import text as TX

    n_tok = (
        tokens_col if tokens_col is not None else TX.token_count(F.col("text"))
    )
    with_tok = df.withColumn("__n_tokens", n_tok).withColumn(
        "__w", weight_col
    )
    totals = with_tok.groupBy(source_col).agg(
        F.sum("__n_tokens").cast("long").alias("__src_tokens")
    )
    frac = F.least(
        F.lit(1.0),
        (F.col("__w") * F.lit(float(token_budget)))
        / F.col("__src_tokens").cast("double"),
    )
    return (
        with_tok.join(F.broadcast(totals), source_col)
        .withColumn("__frac", frac)
        .filter(_hash_uniform(F.col(id_col)) < F.col("__frac"))
        .drop("__w")
    )


def mixture_report(
    df: DataFrame,
    weight_col: Column,
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source mixture outcome: kept docs/tokens vs the token target.

    ``shortfall`` > 0 flags sources whose AVAILABLE tokens fall short of
    their budget (frac capped at 1) — the signal to re-weight
    deliberately; sampling noise around a met target is NOT a shortfall.

    The report is anchored on the per-source TOTALS frame, not the kept
    rows: a source whose fraction rounds low enough to keep zero
    documents still gets its row (n_docs_kept = 0, full target/shortfall
    columns) — the worst-affected sources are exactly the ones the
    report must not silently drop. Weights are read per source via MIN
    (the weight expression is a function of the source by contract).
    """
    from ..functions import text as TX

    # ONE token-count projection and ONE per-source totals aggregate feed
    # both the report frame and the kept-row filter (mixture_sample would
    # rebuild both — a duplicated corpus scan on a 100 TB-shaped path);
    # the kept filter reuses mixture_sample's exact frac expression via
    # the broadcast totals, so kept rows are identical by construction
    with_tok = df.withColumn(
        "__n_tokens", TX.token_count(F.col("text"))
    ).withColumn("__w", weight_col)
    totals = with_tok.groupBy(source_col).agg(
        F.sum("__n_tokens").cast("long").alias("__src_tokens"),
        F.min("__w").alias("__w"),
    )
    frac = F.least(
        F.lit(1.0),
        (F.col("__w") * F.lit(float(token_budget)))
        / F.col("__src_tokens").cast("double"),
    )
    kept = (
        with_tok.drop("__w")
        .join(F.broadcast(totals), source_col)
        .filter(_hash_uniform(F.col(id_col)) < frac)
        .groupBy(source_col)
        .agg(
            F.count("*").alias("__n_docs_kept"),
            F.sum("__n_tokens").cast("long").alias("__n_tokens_kept"),
        )
    )
    target = F.col("__w") * F.lit(float(token_budget))
    return totals.join(kept, source_col, "left").select(
        source_col,
        F.coalesce("__n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
        F.coalesce("__n_tokens_kept", F.lit(0))
        .cast("long")
        .alias("n_tokens_kept"),
        F.least(
            F.lit(1.0), target / F.col("__src_tokens").cast("double")
        ).alias("frac"),
        target.alias("target_tokens"),
        F.greatest(
            F.lit(0.0), target - F.col("__src_tokens").cast("double")
        ).alias("shortfall"),
    )
