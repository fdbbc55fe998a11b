"""SimHash near-duplicate detection, pure DataFrame ops.

SimHash folds every token hash into a single 64-bit signature whose bits
follow the sign of per-bit weighted sums; near-duplicates are pairs with
small Hamming distance.

Implementation shape (scale-first):

* token explode → xxhash64 per token (one narrow stage);
* ONE groupBy(doc) with 64 conditional-sum aggregates — a single shuffle
  with map-side partials, instead of exploding 64 bit-rows per token;
* signature assembled from the 64 sums with bitwise ORs (no overflow —
  Spark 4 runs ANSI mode, so additions on bit 63 would raise);
* candidates: 4 disjoint 16-bit bands of the signature — two signatures
  within Hamming distance 3 must agree on at least one band (pigeonhole),
  so the band join finds all pairs with dist <= 3 exactly;
* verify with bit_count(xor) <= max_distance.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 64
N_BANDS = 4  # 16 bits each → exact for max_distance <= 3


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) — 64-bit signature as a long."""
    from ..catalog import spread

    # tokenize + 64 map-side partial sums are CPU-bound: ensure the stage
    # isn't serialized by a single-split scan (no-op on multi-split input)
    df = spread(df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    hashed = toks.select(id_col, F.xxhash64("tok").alias("th"))
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{b}")
        for b in range(N_BITS)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    sig = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        ),
        range(N_BITS),
        F.lit(0).cast("long"),
    )
    return agg.select(F.col(id_col), sig.alias("simhash"))


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
    counts = bands.groupBy("band_idx", "band_val").agg(F.count("*").alias("bsz"))
    bands = bands.join(
        counts.filter(F.col("bsz") <= max_bucket), ["band_idx", "band_val"]
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
