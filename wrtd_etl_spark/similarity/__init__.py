"""Approximate-nearest-neighbor search over embedding columns."""

from .ann import brute_force_top_k, cosine, lsh_top_k
from .ivf import ivf_top_k
from .kmeans import train_centroids_kmeans

__all__ = [
    "brute_force_top_k",
    "cosine",
    "lsh_top_k",
    "ivf_top_k",
    "train_centroids_kmeans",
]
