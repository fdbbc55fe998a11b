"""Distributed k-means (Lloyd) for IVF coarse-centroid training.

Upgrades the deterministic hash-sample centroid pick in
:mod:`wrtd_etl_spark.similarity.ivf`: a few Lloyd rounds move centroids to
the actual density of the corpus, evening out cell sizes (the quantity that
bounds IVF search cost) and raising recall at the same ``nprobe``.
Assignment during training is SPHERICAL (cosine argmax) — the same metric
the IVF index uses at assignment/query time, so trained centroids optimize
the geometry that is actually searched.

Scale shape per round (the 100 TB lens):

* **assign** — one corpus pass; nearest-centroid argmax is a numpy matmul
  per Arrow batch against the K×dim centroid matrix baked into the UDF
  closure (broadcast by construction, same trade as ivf._make_pandas_assign);
* **update** — one exchange keyed by cell id (K keys ≤ a few thousand →
  partial aggregation upstream would be ideal, but vector means need the
  vectors; ``applyInPandas`` per cell keeps the mean a single vectorized
  reduction per group). K bounds the shuffle width, not the corpus;
* **driver round-trip** — exactly K×dim floats per round (the new
  centroids), the canonical bounded-state crossing of an iterative
  algorithm. Rounds are FIXED (default 4) — deterministic results, no
  convergence action needed; empty cells keep their previous centroid.

No SQL oracle (centroid trajectories are engine-specific float math) —
rows-only in the registry, with recall/balance pytest coverage against the
hash-sample baseline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.sampling import hash32 as _h32
from pyspark.sql import functions as F

from .ann import _as_double


def train_centroids_kmeans(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    rounds: int = 4,
    cell_sample_cap: int = 200_000,
) -> list[list[float]]:
    """K centroids after ``rounds`` Lloyd iterations.

    Init = the same multiplicative-hash sample ivf.py uses, so round 0
    reproduces the untrained behavior exactly and every extra round is a
    strict refinement of the same deterministic start.

    ``cell_sample_cap`` bounds the update step's per-cell pandas group:
    a 100 TB corpus over K=few-thousand cells would otherwise deliver
    billions of rows to ONE ``applyInPandas`` group. Each mean is
    instead computed over at most this many rows per cell, chosen by a
    deterministic multiplicative hash of the id — an unbiased fixed
    sample that keeps the group memory bounded, the reduction order
    stable (the bit-exact determinism contract), and the estimate's
    standard error ~1/sqrt(cap), far below Lloyd's own movement per
    round. The cap never binds at test scale, so small-corpus results
    are the exact means.
    """
    import numpy as np

    from .ann import _non_null_vectors

    corpus = _non_null_vectors(corpus, vec_col)
    vecs = corpus.select(
        F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("v")
    )
    # Every Lloyd round re-reads vecs for assign + update, and the init
    # sample adds one more pass — persist the two-column projection once
    # so `rounds` rounds cost `rounds` cached scans, not 2x`rounds`
    # parquet scans of the full corpus.
    vecs = vecs.persist()

    centroids = [
        [float(x) for x in r[0]]
        for r in vecs.select(
            "v", (_h32(F.col("__id"))).alias("__h")
        )
        .orderBy("__h", "__id")
        .limit(n_cells)
        .collect()
    ]

    if not centroids:  # empty corpus: nothing to train on
        vecs.unpersist()
        return []

    for _ in range(rounds):
        C = np.asarray(centroids, dtype=np.float64)
        Cn = np.sqrt((C * C).sum(axis=1))
        Cn[Cn == 0] = 1.0

        @F.pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            # SPHERICAL assignment (cosine argmax), the SAME metric
            # ivf._make_pandas_assign uses at index/query time — training
            # under Euclidean while assigning under cosine would optimize
            # centroids for the wrong geometry on heterogeneous-norm
            # embeddings. Vector norm is constant across centroids, so
            # dot/|c| ranks identically to full cosine.
            if len(v) == 0:  # empty Arrow batch
                return pd.Series([], dtype="int32")
            V = np.stack(v.to_numpy()).astype(np.float64)
            sims = (V @ C.T) / Cn
            return pd.Series(sims.argmax(axis=1).astype(np.int32))

        def cell_mean(pdf: pd.DataFrame) -> pd.DataFrame:
            # Row order inside a group depends on shuffle/partition order,
            # and float summation is non-associative — sort by the stable
            # id so the reduction order (and thus the trained centroids)
            # is bit-identical run to run, as the determinism test asserts.
            pdf = pdf.sort_values("__id")
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {"cell": [int(pdf["cell"].iloc[0])], "mean_v": [M.mean(axis=0)]}
            )

        # per-cell exact cap BEFORE the pandas group: row_number over the
        # cell partition in deterministic (hash, id) order, keep ≤ cap.
        # The window and the groupBy hash-partition on the same key, so
        # Catalyst plans ONE exchange (ReusedExchange) — the cap costs a
        # spill-safe per-cell sort, never a second shuffle, and the
        # applyInPandas group is bounded by construction.
        from pyspark.sql import Window

        h = _h32(F.col("__id"))
        w = Window.partitionBy("cell").orderBy(h.asc(), F.col("__id").asc())
        means = (
            vecs.withColumn("cell", nearest(F.col("v")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cell_sample_cap)
            .drop("__rn")
            .groupBy("cell")
            .applyInPandas(cell_mean, schema="cell int, mean_v array<double>")
            .collect()
        )
        new_c = list(centroids)  # empty cells keep their previous centroid
        for r in means:
            new_c[r["cell"]] = [float(x) for x in r["mean_v"]]
        centroids = new_c

    vecs.unpersist()
    return centroids
