"""IVF (inverted-file) ANN: coarse quantization + cell-restricted search.

The second scale path next to hyperplane LSH (similarity/ann.py):

1. **Train**: K coarse centroids. Here: deterministic — the first K corpus
   vectors (a real deployment would k-means them; the pipeline shape is
   identical and this keeps every run reproducible).
2. **Assign**: every vector goes to its nearest centroid's cell — one pass,
   a pure expression (argmax over K dot products with centroid literals),
   no shuffle.
3. **Search**: a probe scores only vectors in its ``nprobe`` nearest cells
   — the join is on cell ids, so cost is ~(nprobe/K) of brute force.

Centroids are collected to the driver once (K vectors — bounded and tiny)
and inlined as literals, i.e. broadcast by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ann import _as_double, _dot, _quantized_cosine_with_norms, sq_norm


def _centroid_sims(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of cosine-proportional scores against each centroid literal.

    Norm of ``vec`` is constant across centroids, so dot/|c| ranks cells
    identically to full cosine — one sqrt per centroid, precomputed in
    Python."""
    import math

    cols = []
    for c in centroids:
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        lit = F.array(*[F.lit(float(x)) for x in c])
        cols.append(_dot(vec, lit) / F.lit(norm))
    return F.array(*cols)


def _assign_cells(df: DataFrame, vec_col: str, id_col: str, centroids, nprobe: int):
    sims = _centroid_sims(_as_double(F.col(vec_col)), centroids)
    # top-nprobe cells: indices of the nprobe largest scores
    sorted_desc = F.reverse(F.array_sort(sims))
    cells = F.transform(
        F.slice(sorted_desc, 1, nprobe),
        lambda s: F.array_position(sims, s).cast("int") - 1,
    )
    return df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        F.explode(F.array_distinct(cells)).alias("cell"),
    )


def ivf_top_k(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors per probe via IVF cells + exact rerank.

    Corpus vectors are assigned to 1 cell; probes fan out to ``nprobe``
    cells. Recall/cost trade on ``nprobe`` exactly like a real IVF index.
    """
    centroids = [
        [float(x) for x in r[0]]
        for r in corpus.select(vec_col).limit(n_cells).collect()
    ]
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
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
