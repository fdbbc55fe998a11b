"""Scalar-quantized (int8) ANN: 4x smaller vectors, rescored exactly.

The fourth standard leg of the similarity family (after brute force,
hyperplane LSH, and IVF): faiss-style SQ8. Each dimension is linearly
mapped to int8 with a per-dimension symmetric scale trained from the
corpus; search scores QUANTIZED vectors (cheap, and the corpus that has
to live in memory/shuffle is 4x smaller — at 100 TB of embeddings the
index either fits because of this or does not fit at all), keeps a
candidate margin, then RESCORES the survivors with exact float cosine so
the returned ordering is exact within the candidate set.

Scale shape: training is one agg (dim floats to the driver — the same
bounded crossing as k-means centroids); quantization is a pure
``zip_with`` expression over a broadcast scale array; search mirrors
brute_force_top_k (broadcast probes, corpus scanned once, only top-k
rows move) with the matmul in int32 over Arrow batches.

Recall: int8 symmetric quantization keeps cosine ordering within ~1e-2
for unit-ish embeddings; the ``rescore_margin`` (candidates = k * margin)
absorbs boundary swaps — the recall pytest pins it against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ann import _as_double, _non_null_vectors


def train_scales(
    corpus: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[float]:
    """Per-dimension symmetric scale: max|x_d| / 127 (zero-safe).

    One aggregate; dim floats cross the driver boundary — train once,
    persist alongside the index (same lifecycle as IVF centroids)."""
    corpus = _non_null_vectors(corpus, vec_col)
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("n")).first()
        if first is None:
            return []
        dim = first["n"]
    maxabs = corpus.select(
        *[
            F.max(F.abs(F.element_at(_as_double(F.col(vec_col)), d + 1))).alias(
                f"m{d}"
            )
            for d in range(dim)
        ]
    ).first()
    return [max(float(maxabs[f"m{d}"]), 1e-12) / 127.0 for d in range(dim)]


def quantize(
    df: DataFrame,
    scales: list[float],
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """int8 code array via a pure zip_with expression (no UDF): the
    broadcast-literal scale array divides each dim, round-to-nearest,
    clamp to [-127, 127]."""
    s = F.array(*[F.lit(x) for x in scales])
    code = F.zip_with(
        _as_double(F.col(vec_col)),
        s,
        lambda x, sc: F.least(
            F.greatest(F.round(x / sc, 0), F.lit(-127.0)), F.lit(127.0)
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, code)


def quantized_top_k(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    scales: list[float] | None = None,
    rescore_margin: int = 4,
) -> DataFrame:
    """(probe_id, neighbor_id, sim, rank): top-k by EXACT cosine among the
    ``k * rescore_margin`` best quantized-score candidates per probe.

    Output schema and tie rules match brute_force_top_k, so the recall
    test is a set comparison."""
    from pyspark.sql import Window

    from ..catalog import spread
    from .ann import _quantized_cosine_with_norms, sq_norm

    corpus = _non_null_vectors(corpus, vec_col)
    probes = _non_null_vectors(probes, vec_col)
    if scales is None:
        scales = train_scales(corpus, vec_col)

    cq = quantize(spread(corpus), scales, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        "qvec",
    )
    pq = quantize(probes, scales, vec_col).select(
        F.col(id_col).alias("probe_id"),
        _as_double(F.col(vec_col)).alias("pv"),
        F.col("qvec").alias("pq"),
    )
    sc2 = np.array(scales, dtype=np.float64) ** 2

    @F.pandas_udf("double")
    def qdot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.int32)
        B = np.stack(b.to_numpy()).astype(np.int32)
        # dequantized dot = sum(qa_d * qb_d * scale_d^2): one vectorized
        # pass per Arrow batch, int32 products (no int8 overflow)
        return pd.Series(((A * B).astype(np.float64) @ sc2))

    scored = (
        cq.join(F.broadcast(pq), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("qsim", qdot(F.col("qvec"), F.col("pq")))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("qsim"), F.asc("neighbor_id")
    )
    candidates = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * rescore_margin)
        .select("probe_id", "neighbor_id", "cv", "pv")
    )
    # exact rescore of the shortlist only
    rescored = candidates.withColumn("cn", sq_norm(F.col("cv"))).withColumn(
        "pn", sq_norm(F.col("pv"))
    ).withColumn(
        "sim",
        _quantized_cosine_with_norms(
            F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
        ),
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "sim", "rank")
    )
