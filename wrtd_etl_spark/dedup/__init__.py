"""Deduplication operators for training-data pipelines.

Five strategies, all expressed as DataFrame transforms (no Python UDFs):

* exact      — hash-groupBy on a normalized fingerprint (linear, 1 shuffle)
* minhash    — shingle → MinHash signature → LSH band buckets → candidate
               pairs → exact-Jaccard verify (near-dup at corpus scale)
* simhash    — 64-bit SimHash + banded Hamming candidate generation
* ngram      — character n-gram Jaccard similarity join via inverted index
* embedding  — cosine near-dup over embedding columns (brute-force +
               hyperplane-LSH scale path)

plus cluster resolution: ``connected_components`` / ``dup_clusters`` turn
any strategy's pair output into transitive duplicate clusters.
"""

from .clusters import connected_components, dup_clusters
from .exact import exact_dedup, exact_dup_groups
from .minhash import minhash_near_dup_pairs, minhash_signatures
from .ngram import ngram_jaccard_pairs
from .simhash import simhash, simhash_near_dup_pairs

__all__ = [
    "connected_components",
    "dup_clusters",
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
]
