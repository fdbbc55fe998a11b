"""IVF (inverted-file) ANN: coarse quantization + cell-restricted search.

The second scale path next to hyperplane LSH (similarity/ann.py):

1. **Train**: K coarse centroids. Here: deterministic — K corpus vectors
   sampled by a multiplicative hash of the id (a real deployment would
   k-means them; the pipeline shape is identical and this keeps every run
   reproducible while avoiding the skewed cells a first-K pick produces
   on sorted/clustered data).
2. **Assign**: every vector goes to its nearest centroid's cell — one pass,
   a pure expression (argmax over K dot products with centroid literals),
   no shuffle.
3. **Search**: a probe scores only vectors in its ``nprobe`` nearest cells
   — the join is on cell ids, so cost is ~(nprobe/K) of brute force.

Centroids are collected to the driver once (K vectors — bounded and tiny)
and inlined as literals, i.e. broadcast by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window

from ..operators.sampling import hash32 as _h32
from pyspark.sql import functions as F

from .ann import _as_double, _quantized_cosine_with_norms, sq_norm


def _make_pandas_assign(centroids: list[list[float]], nprobe: int):
    """Arrow-vectorized cell assignment: top-``nprobe`` centroid indices.

    Vector norm is constant across centroids, so dot/|c| ranks cells
    identically to full cosine. The expression form (K dot products as
    interpreted ``aggregate``/``zip_with`` HOFs per row — K x dim lambda
    evals) dominated the IVF wall-time at sf0.1; one numpy matmul per
    Arrow batch replaces it, the same trade measured for the LSH band
    signatures (ann.py)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)  # K x dim
    norms = np.sqrt((C * C).sum(axis=1))
    norms[norms == 0] = 1.0

    if nprobe == 1:
        # the corpus-side pass: a plain argmax (no K-wide argsort, no
        # array build, no downstream explode) — argmax returns the FIRST
        # maximal index, matching the stable-sort tie-break below
        @F.pandas_udf("int")
        def assign1(v: pd.Series) -> pd.Series:
            if len(v) == 0:  # empty Arrow batch (empty split/partition)
                return pd.Series([], dtype="int32")
            V = np.stack(v.to_numpy()).astype(np.float64)
            sims = (V @ C.T) / norms  # n x K
            return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

        return assign1

    @F.pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch (empty split/partition)
            return pd.Series([], dtype=object)
        V = np.stack(v.to_numpy()).astype(np.float64)
        sims = (V @ C.T) / norms  # n x K
        # stable sort = deterministic tie-break by centroid index
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in idx])

    return assign


def _assign_cells(df: DataFrame, vec_col: str, id_col: str, centroids, nprobe: int):
    from ..catalog import spread
    from .ann import _non_null_vectors

    df = _non_null_vectors(df, vec_col)  # None rows cannot be stacked
    if not centroids:
        # no cells exist (empty corpus): typed empty assignment
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, v array<double>, cell int"
        )
    assign = _make_pandas_assign(centroids, nprobe)
    # assignment is the CPU-bound corpus pass — don't let a single-split
    # scan serialize it (no-op on multi-split input)
    cell = (
        assign(_as_double(F.col(vec_col)))
        if nprobe == 1
        else F.explode(assign(_as_double(F.col(vec_col))))
    )
    return spread(df).select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        cell.alias("cell"),
    )


def ivf_top_k(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k neighbors per probe via IVF cells + exact rerank.

    Corpus vectors are assigned to 1 cell; probes fan out to ``nprobe``
    cells. Recall/cost trade on ``nprobe`` exactly like a real IVF index.
    ``centroids`` overrides the default pick (e.g. k-means-trained via
    :func:`wrtd_etl_spark.similarity.kmeans.train_centroids_kmeans`).
    """
    from .ann import _non_null_vectors

    corpus = _non_null_vectors(corpus, vec_col)
    probes = _non_null_vectors(probes, vec_col)
    if centroids is None:
        # Centroid pick: K ids sampled by multiplicative hash (same idiom
        # as dataset_split) — deterministic like first-K but spread
        # uniformly over the id space, so sorted/clustered corpora don't
        # produce K near-equal centroids (skewed cells).
        # TakeOrderedAndProject keeps it one cheap pass, K rows to driver.
        centroids = [
            [float(x) for x in r[0]]
            for r in corpus.select(
                vec_col,
                (_h32(F.col(id_col))).alias(
                    "__h"
                ),
            )
            .orderBy("__h", id_col)
            .limit(n_cells)
            .collect()
        ]
    if not centroids:
        # empty corpus (an empty partition/day at scale must not crash the
        # job): no cells exist, so no probe has any neighbor
        return corpus.sparkSession.createDataFrame(
            [], "probe_id long, neighbor_id long, sim double, rank long"
        )
    c = _assign_cells(corpus, vec_col, id_col, centroids, nprobe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    ).withColumn("cn", sq_norm(F.col("cv")))
    p = _assign_cells(probes, vec_col, id_col, centroids, nprobe=nprobe).select(
        F.col(id_col).alias("probe_id"), F.col("v").alias("pv"), "cell"
    ).withColumn("pn", sq_norm(F.col("pv")))
    scored = (
        c.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "sim",
            _quantized_cosine_with_norms(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ),
        )
        .select("probe_id", "neighbor_id", "sim")
    )
    # no dedup pass: each corpus vector lives in exactly one cell
    # (nprobe=1 assignment) and probe cells are array_distinct'ed, so a
    # (probe, neighbor) pair cannot appear twice — a .distinct() here
    # would be a redundant full shuffle of all scored pairs
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
