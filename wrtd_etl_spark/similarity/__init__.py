"""Approximate-nearest-neighbor search over embedding columns."""

from .ann import brute_force_top_k, cosine, lsh_top_k

__all__ = ["brute_force_top_k", "cosine", "lsh_top_k"]
