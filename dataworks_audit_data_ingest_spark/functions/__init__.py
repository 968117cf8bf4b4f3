"""Portable expression helpers shared by the query surface."""
