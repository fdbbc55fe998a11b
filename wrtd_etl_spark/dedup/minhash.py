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
4. candidate pairs = docs sharing any band bucket (groupBy the bucket
   key, enumerate pairs from the sorted member array) — with a
   bucket-size cap so a degenerate hot bucket can't go quadratic at
   scale;
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
from pyspark.sql import Column, DataFrame
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
    bands: int | None = None,
    include_sig: bool = True,
) -> DataFrame:
    """(id, sh_hashes[, sig][, band_hashes]): hashed shingle set + MinHash sig.

    ``include_sig=False`` (requires ``bands``) omits the raw signature from
    the UDF output — the near-dup pipeline only consumes ``band_hashes``
    (banding) and ``sh_hashes`` (verify), so the 64-longs-per-doc signature
    would be Arrow-transferred and checkpointed for nothing.

    Split: per-TOKEN hashing stays JVM-side (one xxhash64 per token);
    shingle combination (rolling window over token hashes), dedup, the
    ``min((a*h+b) mod p)`` reduction, AND the per-band LSH bucket hashes
    are one Arrow-vectorized numpy pass. Two measured reasons to keep all
    of this in the UDF rather than expressions:

    * the slice+concat-per-shingle / num_hashes-lambda-folds form ran as
      interpreted higher-order functions (~10 s for 5k docs at sf0.1 vs
      <1 s vectorized);
    * a 16-band ``xxhash64(concat_ws(transform(slice(sig ...))))`` array
      expression compiled ~6 s of whole-stage codegen on first execution
      (Janino, one giant Generate function) — per fresh query, since each
      run builds a new plan. Banding inside the UDF is one reshape+poly
      combine and removes the expression entirely.

    Shingle identity is the hash-tuple combine rather than the joined
    string — equivalent partitioning modulo negligible 32-bit collisions.
    """
    from ..catalog import spread

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 32)))
    # NULL documents have no shingles and can't near-duplicate anything —
    # drop them at the scan (pushed-down IsNotNull) so the UDF never sees
    # a None token array
    df = df.filter(F.col(text_col).isNotNull())
    # tokenize + signature UDF are the CPU-bound corpus scan: guarantee it
    # isn't serialized by a single-split file (no-op on multi-split input)
    base = spread(df).select(F.col(id_col), th.alias("th"))

    if bands and num_hashes % bands != 0:
        raise ValueError(
            f"bands must divide num_hashes (got {num_hashes=} {bands=}): "
            "the in-UDF banding reshapes the signature into "
            "(bands, num_hashes//bands)"
        )
    if not include_sig and not bands:
        raise ValueError("include_sig=False requires bands (nothing to return)")
    params = _hash_params(num_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.uint64)
    B = np.array([b for _, b in params], dtype=np.uint64)
    k = shingle_k
    n_bands = bands or 0
    rows = num_hashes // n_bands if n_bands else 0
    COMBINE = np.uint64(1_000_003)  # polynomial combine base
    M32 = np.uint64((1 << 32) - 1)
    M63 = np.uint64((1 << 63) - 1)  # keep band hashes positive int64

    schema = "sh_hashes array<long>"
    if include_sig:
        schema += ", sig array<long>"
    if n_bands:
        schema += ", band_hashes array<long>"

    @F.pandas_udf(schema)
    def sig_udf(th_col: pd.Series) -> pd.DataFrame:
        sh_out, sig_out, bh_out = [], [], []
        empty_sig = np.full(len(A), _P - 1, dtype=np.uint64)

        def band_hash(sig_u64: np.ndarray) -> np.ndarray:
            # poly-combine each band's rows + band-index salt, one pass
            b = sig_u64.reshape(n_bands, rows)
            acc = np.arange(n_bands, dtype=np.uint64) * np.uint64(0x9E3779B9)
            for j in range(rows):
                acc = acc * COMBINE + b[:, j]
            return (acc & M63).astype(np.int64)

        for h in th_col:
            t = np.asarray(h, dtype=np.uint64)
            n = t.size
            if n == 0:
                sh_out.append(np.empty(0, dtype=np.int64))
                sig_out.append(empty_sig.astype(np.int64))
                if n_bands:
                    bh_out.append(band_hash(empty_sig))
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
            sig_u64 = m.min(axis=1)
            sh_out.append(sh.astype(np.int64))
            sig_out.append(sig_u64.astype(np.int64))
            if n_bands:
                bh_out.append(band_hash(sig_u64))
        out = {"sh_hashes": sh_out}
        if include_sig:
            out["sig"] = sig_out
        if n_bands:
            out["band_hashes"] = bh_out
        return pd.DataFrame(out)

    packed = base.select(F.col(id_col), sig_udf(F.col("th")).alias("p"))
    cols = [F.col(id_col), F.col("p.sh_hashes").alias("sh_hashes")]
    if include_sig:
        cols.append(F.col("p.sig").alias("sig"))
    if n_bands:
        cols.append(F.col("p.band_hashes").alias("band_hashes"))
    return packed.select(*cols)


def _band_buckets(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band_idx, band_hash) postings from precomputed band hashes."""
    return sigs.select(
        F.col(id_col), F.posexplode("band_hashes").alias("band_idx", "band_hash")
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
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, seed, bands=bands,
        include_sig=False,
    )
    sigs = sigs.withColumn("sh_size", F.size("sh_hashes"))
    # Three consumers (banding, both verify sides) — materialize the one
    # corpus scan ONCE. localCheckpoint stores plain row blocks; .persist()
    # would route the array<long> columns through the columnar cache
    # builder's generic per-element encoder, which was measured ~7x slower
    # than recomputing the signatures (11 s vs 1.5 s at sf0.1). On a
    # cluster the same role is played by a reliable checkpoint / temp
    # table; the plan shape is identical.
    sigs = sigs.localCheckpoint(eager=False)
    buckets = _band_buckets(sigs, id_col)

    # Hot-bucket cap BEFORE the bucket lists materialize: a degenerate
    # bucket (every empty/boilerplate doc colliding) must never reach
    # collect_list — the aggregation buffer for one giant bucket does not
    # spill element-wise and would OOM the task, defeating the cap's whole
    # purpose. Cap as a WINDOW count over the bucket key (r14, the fuzzy.py r13
    # idiom; guide §2.4): the former count-aggregate + broadcast anti-join
    # scanned the checkpointed buckets twice and planned an extra exchange
    # + broadcast build; the window hash-partitions by (band_idx,
    # band_hash) once and the collect_list groupBy below REUSES that
    # partitioning. Same cap semantics (window count ≡ group count), and
    # a degenerate bucket spills in the window sort instead of growing an
    # aggregation buffer. Interleaved A/B at sf0.1: 1.82 → 1.30 s.
    from pyspark.sql import Window

    _w = Window.partitionBy("band_idx", "band_hash")
    cold = (
        buckets.withColumn("__n", F.count(F.lit(1)).over(_w))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    # Candidate pairs straight from the grouped bucket: one exchange on the
    # bucket key, pair enumeration as an array expression over the sorted
    # member list (singleton buckets are dropped post-agg — they cannot
    # OOM and need no pre-pruning).
    grouped = (
        cold.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    candidates = (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id1", "p.id2")
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
