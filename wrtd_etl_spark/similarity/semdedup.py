"""Semantic deduplication (SemDeDup-style): k-means cells + within-cell
cosine pruning.

The published construction (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540)
clusters the embedding corpus with k-means and removes, within each
cluster, every item whose cosine similarity to another kept item exceeds a
threshold — semantic near-dups that share no surface n-grams (paraphrases,
re-renders, translations of boilerplate) and are therefore invisible to
MinHash/SimHash/ngram dedup.

Spark-first shape (the 100 TB lens):

* **cells** — :func:`~wrtd_etl_spark.similarity.kmeans.train_centroids_kmeans`
  (bounded K×dim driver state) + the same broadcast matmul assignment the
  IVF index uses: one corpus pass, no shuffle.
* **within-cell pruning** — ONE exchange keyed by cell id, then a
  per-cell ``applyInPandas`` that computes the pairwise cosine matrix in
  id-sorted blocks. The quadratic work is confined to a cell, and the
  cell is capped (``max_cell``) the same way kmeans caps its update
  groups: a deterministic (hash, id) ``row_number`` keeps the first
  ``max_cell`` rows eligible; overflow rows are KEPT unexamined — at
  scale you raise ``n_cells`` so cells stay small rather than raising
  the cap (cost per cell is O(m²·dim/block)).
* **determinism** — centroid training is bit-deterministic (kmeans
  module contract), assignment ties break by centroid index, the
  survivor rule is min-id, and the cosine matrix is computed over
  id-sorted float64 rows — the loser set is reproducible run to run.

Survivor rule: within a cell, scanning ids ascending, a row is a LOSER
iff some smaller-id row (loser or not) has cosine ≥ ``threshold`` with
it; ``dup_of`` is the smallest such id. Matching losers against *all*
earlier rows (not just survivors) is the standard greedy SemDeDup rule
and makes the decision per-row independent (no chain sensitivity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..operators.sampling import hash32 as _h32
from pyspark.sql import functions as F

from .ivf import _assign_cells
from .kmeans import train_centroids_kmeans


def semantic_dup_losers(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_cells: int = 16,
    rounds: int = 2,
    max_cell: int = 4096,
    block: int = 1024,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id, dup_of, cosine): rows to DROP, with their earliest semantic dup.

    ``cosine`` is quantized to 1e-6 (the engine's cross-engine float
    idiom) so downstream thresholding is stable.

    ``centroids`` skips training and partitions with a precomputed set —
    the production pattern when the same trained cells already back the
    IVF index (train once, reuse for search AND dedup; cell geometry only
    needs to reflect corpus density, not the exact row set).
    """
    if centroids is None:
        centroids = train_centroids_kmeans(
            corpus, vec_col, id_col, n_cells=n_cells, rounds=rounds
        )
    assigned = _assign_cells(corpus, vec_col, id_col, centroids, nprobe=1)
    thr = float(threshold)
    blk = int(block)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__sid").reset_index(drop=True)
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id": [], "dup_of": [], "cosine": []}).astype(
                {"id": "int64", "dup_of": "int64", "cosine": "float64"}
            )
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = 1.0  # zero vectors: cos := 0, never a dup
        Vn = V / norms[:, None]
        ids = pdf["__sid"].to_numpy()
        out_id, out_dup, out_cos = [], [], []
        # blocked upper-triangular scan: block×m float64 scratch, never m×m
        for s in range(1, m, blk):
            e = min(s + blk, m)
            S = Vn[s:e] @ Vn.T  # (e-s) × m
            for r in range(e - s):
                i = s + r
                row = S[r, :i]  # strictly earlier ids only
                hits = np.flatnonzero(row >= thr)
                if hits.size:
                    j = int(hits[0])  # smallest earlier id (sorted order)
                    out_id.append(int(ids[i]))
                    out_dup.append(int(ids[j]))
                    out_cos.append(np.floor(row[j] * 1e6 + 0.5) / 1e6)
        return pd.DataFrame(
            {"id": out_id, "dup_of": out_dup, "cosine": out_cos}
        ).astype({"id": "int64", "dup_of": "int64", "cosine": "float64"})

    from pyspark.sql import Window

    # cap BEFORE the pandas group (same one-exchange construction as the
    # kmeans update: window and groupBy hash-partition on `cell`, so the
    # cap costs a per-cell sort inside the one shuffle, not a second one)
    h = _h32(F.col(id_col))
    w = Window.partitionBy("cell").orderBy(h.asc(), F.col(id_col).asc())
    capped = (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_cell)
        .select(F.col(id_col).alias("__sid"), "v", "cell")
    )
    losers = capped.groupBy("cell").applyInPandas(
        prune, schema="id long, dup_of long, cosine double"
    )
    return losers.select(
        F.col("id").alias(id_col), "dup_of", "cosine"
    )


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Corpus with semantic near-dups removed (min-id survivor per group).

    The loser set is tiny relative to the corpus in any healthy pipeline,
    so the removal join is a broadcast-friendly left anti — but the
    strategy is left to AQE for the same reason dedup_apply documents:
    when dedup matters most the loser side is NOT small."""
    losers = semantic_dup_losers(corpus, vec_col, id_col, **kwargs)
    return corpus.join(
        losers.select(id_col), id_col, "left_anti"
    )
