"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline (the standard shingle→minhash→band→bucket-join construction):

1. token shingles per doc (array expr, no explode);
2. MinHash signature: for each of ``num_hashes`` universal hash functions
   ``(a*h + b) mod p``, the min over shingle hashes — base hashes are
   JVM-side xxhash64, the min-reduction is one Arrow-vectorized numpy
   pass (the pure-expression form was the dominant cost: interpreted
   higher-order functions, see plans/pipeline_queries notes);
3. LSH: split the signature into ``bands`` bands of ``rows_per_band``;
   hash each band; explode to (doc, band_idx, band_hash);
4. candidate pairs = docs sharing any band bucket (self-join on the
   bucket key) — with a bucket-size cap so a degenerate hot bucket can't
   go quadratic at scale;
5. verify candidates with exact Jaccard over the distinct hashed
   shingle sets (32-bit shingle hashes — collision probability is
   negligible for near-dup verification and the arrays shuffle 10x
   smaller than raw shingle strings).

Scale shape: the only shuffles are the band-bucket exchange and the final
verify join, both on well-distributed hash keys; signature computation is
embarrassingly parallel. Probability a pair with Jaccard j collides:
1 - (1 - j^rows)^bands.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# p > 2^32 prime; hash values are first reduced mod 2^32 so a*h+b stays
# well under 2^63 (Spark 4 runs ANSI mode: integer overflow raises).
_P = 4294967311
_A_MAX = 1 << 25


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _A_MAX), rng.randrange(0, _P)) for _ in range(num_hashes)
    ]


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles as an array column (no row explosion)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sh_hashes, sig): distinct hashed shingle set + MinHash sig.

    Split: per-TOKEN hashing stays JVM-side (one xxhash64 per token);
    shingle combination (rolling window over token hashes), dedup, and the
    ``min((a*h+b) mod p)`` reduction are one Arrow-vectorized numpy pass.
    The pure-expression form (slice+concat per shingle, then num_hashes
    lambda folds) was the dominant corpus-scan cost — interpreted
    higher-order functions, ~10 s for 5k docs at sf0.1 vs <1 s vectorized.
    Shingle identity is the hash-tuple combine rather than the joined
    string — equivalent partitioning modulo negligible 32-bit collisions.
    """
    from ..catalog import spread

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 32)))
    # tokenize + signature UDF are the CPU-bound corpus scan: guarantee it
    # isn't serialized by a single-split file (no-op on multi-split input)
    base = spread(df).select(F.col(id_col), th.alias("th"))

    params = _hash_params(num_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.uint64)
    B = np.array([b for _, b in params], dtype=np.uint64)
    k = shingle_k
    COMBINE = np.uint64(1_000_003)  # polynomial combine base
    M32 = np.uint64((1 << 32) - 1)

    @F.pandas_udf("sh_hashes array<long>, sig array<long>")
    def sig_udf(th_col: pd.Series) -> pd.DataFrame:
        sh_out, sig_out = [], []
        empty_sig = np.full(len(A), _P - 1, dtype=np.int64)
        for h in th_col:
            t = np.asarray(h, dtype=np.uint64)
            n = t.size
            if n == 0:
                sh_out.append(np.empty(0, dtype=np.int64))
                sig_out.append(empty_sig)
                continue
            # same window count as the string form: max(n-k, 0) + 1
            if n >= k:
                win = np.lib.stride_tricks.sliding_window_view(t, k)
            else:
                win = t[None, :]
            acc = np.zeros(win.shape[0], dtype=np.uint64)
            for j in range(win.shape[1]):  # k is tiny; wraps are intended
                acc = acc * COMBINE + win[:, j]
            sh = np.unique(acc & M32)
            m = (A[:, None] * sh[None, :] + B[:, None]) % np.uint64(_P)
            sh_out.append(sh.astype(np.int64))
            sig_out.append(m.min(axis=1).astype(np.int64))
        return pd.DataFrame({"sh_hashes": sh_out, "sig": sig_out})

    packed = base.select(F.col(id_col), sig_udf(F.col("th")).alias("p"))
    return packed.select(
        id_col, F.col("p.sh_hashes").alias("sh_hashes"), F.col("p.sig").alias("sig")
    )


def _band_buckets(sigs: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    band_arr = F.array(
        *[
            F.xxhash64(F.concat_ws(",", F.transform(
                F.slice(F.col("sig"), i * rows + 1, rows), lambda x: x.cast("string")
            )), F.lit(i))
            for i in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_idx", "band_hash")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id1 < id2, jaccard >= threshold).

    ``max_bucket`` drops degenerate LSH buckets (e.g. every empty doc) so a
    hot bucket can't turn the candidate join quadratic — at 100 TB this is
    the difference between a working job and an exploding one; dropped
    buckets only lose pairs that almost certainly collide in another band.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, seed)
    sigs = sigs.withColumn("sh_size", F.size("sh_hashes"))
    # two consumers (banding, verification) — persist the one corpus scan
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    buckets = _band_buckets(sigs, id_col, bands, rows)

    # cap bucket size (hot-key hygiene) with a count() window over the
    # bucket key: one exchange on (band_idx, band_hash) that the self-join
    # below then reuses — vs. the aggregate+join form which shuffles the
    # postings twice (once for the count, once to join it back)
    wb = Window.partitionBy("band_idx", "band_hash")
    buckets = (
        buckets.withColumn("bsz", F.count("*").over(wb))
        .filter(F.col("bsz") <= max_bucket)
        .drop("bsz")
    )
    left = buckets.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id1")
    )
    right = buckets.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id2")
    )
    candidates = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )

    # verify: exact Jaccard over the distinct shingle sets
    s1 = sigs.select(
        F.col(id_col).alias("id1"),
        F.col("sh_hashes").alias("sh1"),
        F.col("sh_size").alias("sz1"),
    )
    s2 = sigs.select(
        F.col(id_col).alias("id2"),
        F.col("sh_hashes").alias("sh2"),
        F.col("sh_size").alias("sz2"),
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    verified = (
        candidates.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("shared", inter)
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return verified
