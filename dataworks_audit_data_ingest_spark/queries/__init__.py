"""Query registry — the engine's operator surface, one entry per operator.

Each query is a named pair of (PySpark builder, ANSI-SQL oracle). The oracle
runs on DuckDB over the same parquet fixtures; both sides alias output columns
identically so the driver's order-insensitive value-hash can match.
"""

from __future__ import annotations

from .base import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY via their @register decorators.
from . import relational  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import streaming_shaped  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import ingest_shaped  # noqa: E402,F401
from . import multimodal_shaped  # noqa: E402,F401
from . import interval  # noqa: E402,F401
from . import tpch_deep  # noqa: E402,F401


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
