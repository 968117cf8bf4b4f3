"""Similarity-search API."""

from .knn import cosine_expr, knn_join  # noqa: F401
