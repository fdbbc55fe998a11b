"""Reusable relational operators (SURVEY.md §2.3-2.8).

Each function here is a pure DataFrame→DataFrame transform; plans compose
them. Nothing collects to the driver; nothing uses RDDs.
"""

from .joins import broadcast_dim_join, double_role_dim_join, null_safe_anti_join
from .upsert import upsert_by_key
from .windows import dense_rank_top_k

__all__ = [
    "broadcast_dim_join",
    "double_role_dim_join",
    "null_safe_anti_join",
    "upsert_by_key",
    "dense_rank_top_k",
]
