"""SimHash near-duplicate detection, pure DataFrame ops.

SimHash folds every token hash into a single 64-bit signature whose bits
follow the sign of per-bit weighted sums; near-duplicates are pairs with
small Hamming distance.

Implementation shape (scale-first):

* per-token xxhash64 stays JVM-side (``transform`` over the split array —
  one narrow stage, no explode);
* the 64 per-bit ±1 sums + sign-bit packing are one Arrow-vectorized
  numpy pass per document — NO shuffle at all for signature computation.
  (The previous form — explode to token rows + ONE groupBy(doc) with 64
  conditional-sum aggregates — was already single-shuffle, but 64
  interpreted CASE evaluations per token row dominated the corpus scan:
  4.2 s at sf0.1 vs ~1 s vectorized, the same trade measured for the
  MinHash signatures);
* candidates: 4 disjoint 16-bit bands of the signature — two signatures
  within Hamming distance 3 must agree on at least one band (pigeonhole),
  so the band join finds all pairs with dist <= 3 exactly;
* verify with bit_count(xor) <= max_distance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BITS = 64
N_BANDS = 4  # 16 bits each → exact for max_distance <= 3


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) — 64-bit signature as a long.

    Bit semantics: bit b is set iff more token hashes have bit b set than
    clear (strict majority — a 0-sum tie leaves the bit clear), duplicates
    counted. ``split`` on an empty text yields the single token ``""``, so
    every document gets a signature.
    """
    import numpy as np

    from ..catalog import spread

    df = df.filter(F.col(text_col).isNotNull())  # NULL text: no signature
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    # tokenize + signature UDF are the CPU-bound corpus scan: ensure it
    # isn't serialized by a single-split scan (no-op on multi-split input)
    base = spread(df).select(F.col(id_col), th.alias("th"))

    shifts = np.arange(N_BITS, dtype=np.uint64)

    @F.pandas_udf("long")
    def sig_udf(th_col: pd.Series) -> pd.Series:
        out = []
        for h in th_col:
            t = np.asarray(h, dtype=np.uint64)
            # bits: n_tokens x 64 {0,1}; per-bit sum of (2b-1) == ±1 votes
            bits = ((t[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = 2 * bits.sum(axis=0) - t.size
            packed = np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << shifts
            )
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return base.select(F.col(id_col), sig_udf(F.col("th")).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    max_bucket: int = 10000,
) -> DataFrame:
    """Pairs (id1 < id2) with Hamming(simhash1, simhash2) <= max_distance.

    Exact (no recall loss) for ``max_distance < N_BANDS`` by pigeonhole on
    the 16-bit bands. ``max_bucket`` guards against a degenerate band value
    (e.g. all-zero docs) going quadratic.
    """
    sigs = simhash(df, text_col, id_col)
    bands = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    # hot-bucket cap via a count window over the bucket key: one exchange
    # on (band_idx, band_val) that the self-join below reuses, vs. the
    # aggregate+join form which shuffles the bands twice
    wb = Window.partitionBy("band_idx", "band_val")
    bands = (
        bands.withColumn("bsz", F.count("*").over(wb))
        .filter(F.col("bsz") <= max_bucket)
        .drop("bsz")
    )
    left = bands.select(
        "band_idx", "band_val", F.col(id_col).alias("id1"), F.col("simhash").alias("h1")
    )
    right = bands.select(
        "band_idx", "band_val", F.col(id_col).alias("id2"), F.col("simhash").alias("h2")
    )
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )
