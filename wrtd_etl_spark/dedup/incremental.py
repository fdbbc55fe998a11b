"""Incremental (cross-corpus) near-duplicate detection: dedup a NEW batch
against an existing REFERENCE corpus.

The production shape of dedup at 100 TB is rarely "all-pairs over
everything once" — it is "yesterday's crawl against the standing training
set": reference docs are never re-compared against each other, and only
new-side docs can be dropped. Same MinHash+LSH construction as
:mod:`wrtd_etl_spark.dedup.minhash` (identical hash params/seed, so band
hashes are comparable across the two sides), but the candidate step is a
cross-side bucket JOIN instead of a within-bucket pair enumeration:

1. band postings for both sides (the per-side corpus scan);
2. hot-bucket cap per side BEFORE any join (count-aggregate + broadcast
   anti-join — the same a-degenerate-bucket-must-not-go-quadratic guard);
3. candidates = new-postings ⋈ ref-postings on (band_idx, band_hash) —
   new-side docs that share any band with any reference doc. The join is
   cross-side only by construction: no ref×ref or new×new pairs are ever
   generated, which is what makes the incremental run cheap even when the
   reference corpus dwarfs the batch;
4. verify with exact Jaccard over the hashed shingle sets, keep
   ``jaccard >= threshold``.

At scale the reference side's signatures are computed ONCE and persisted
(they are a plain (id, sh_hashes, band_hashes) table — write it with the
engine's parquet sinks); each nightly batch then pays only its own scan
plus the bucket join. This module takes the two sides as DataFrames and
leaves the persistence to the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import _band_buckets, minhash_signatures


def incremental_near_dup_losers(
    new: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """(new_id, ref_id, jaccard): new-side docs near-duplicating a
    reference doc. ``ref_id`` is the SMALLEST matching reference id (one
    verdict row per dropped doc, deterministic).

    Ids may overlap between the two sides — sides are tracked
    positionally, never by id comparison.
    """
    sides = []
    for df in (new, reference):
        sigs = minhash_signatures(
            df, text_col, id_col, num_hashes, shingle_k, seed,
            bands=bands, include_sig=False,
        ).withColumn("sh_size", F.size("sh_hashes"))
        # one corpus scan per side, three consumers (banding + verify) —
        # same materialization rationale as minhash_near_dup_pairs
        sides.append(sigs.localCheckpoint(eager=False))
    new_sigs, ref_sigs = sides

    def capped_postings(sigs: DataFrame) -> DataFrame:
        buckets = _band_buckets(sigs, id_col)
        hot = (
            buckets.groupBy("band_idx", "band_hash")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band_idx", "band_hash")
        )
        return buckets.join(
            F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
        )

    new_post = capped_postings(new_sigs).select(
        "band_idx", "band_hash", F.col(id_col).alias("new_id")
    )
    ref_post = capped_postings(ref_sigs).select(
        "band_idx", "band_hash", F.col(id_col).alias("ref_id")
    )
    # cross-side candidates only; distinct before the verify join so a
    # pair colliding in several bands is verified once
    candidates = (
        new_post.join(ref_post, ["band_idx", "band_hash"])
        .select("new_id", "ref_id")
        .distinct()
    )

    inter = F.size(F.array_intersect(F.col("sh_new"), F.col("sh_ref")))
    verified = (
        candidates.join(
            new_sigs.select(
                F.col(id_col).alias("new_id"),
                F.col("sh_hashes").alias("sh_new"),
                F.col("sh_size").alias("sz_new"),
            ),
            "new_id",
        )
        .join(
            ref_sigs.select(
                F.col(id_col).alias("ref_id"),
                F.col("sh_hashes").alias("sh_ref"),
                F.col("sh_size").alias("sz_ref"),
            ),
            "ref_id",
        )
        .withColumn("shared", inter)
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz_new") + F.col("sz_ref") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # one row per dropped doc: smallest matching ref id, its jaccard
    return (
        verified.groupBy("new_id")
        .agg(
            F.min("ref_id").alias("ref_id"),
            F.min_by("jaccard", F.col("ref_id")).alias("jaccard"),
        )
    )


def incremental_dedup(
    new: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    **kwargs,
) -> DataFrame:
    """The NEW batch with reference near-dups removed (plus exact dups —
    identical docs share every band, so they are a subset of the LSH
    candidates and need no separate fingerprint pass)."""
    losers = incremental_near_dup_losers(
        new, reference, text_col, id_col, **kwargs
    )
    return new.join(
        losers.select(F.col("new_id").alias(id_col)), id_col, "left_anti"
    )
