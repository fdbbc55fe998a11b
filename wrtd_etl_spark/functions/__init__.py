"""Scalar function surface: reference scalar mappings + text analytics."""

from . import text

__all__ = ["text"]
