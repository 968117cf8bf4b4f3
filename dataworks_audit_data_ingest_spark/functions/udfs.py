"""User-defined function surface.

Engine policy (PERF.md): built-ins first — every operator in ``queries/``
is UDF-free except the crypto and media kernels. When custom logic is
unavoidable, the ladder is:

1. ``pandas_udf`` (Arrow-vectorized, ~10-100× row-at-a-time Python),
2. ``mapInPandas`` for many-column/iterator shapes (crypto, decode),
3. row-at-a-time ``@udf`` only for trivial cold-path glue.

This module holds the reference pandas_udf implementations and exists as
the documented pattern for extensions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalization: lowercase, collapse whitespace runs,
    strip — the canonicalization step ahead of hashing/dedup."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


@pandas_udf(LongType())
def byte_length(s: pd.Series) -> pd.Series:
    """UTF-8 byte length, vectorized (pandas str accessor batch)."""
    return s.str.encode("utf-8").str.len().astype("int64")


def normalized_fingerprint(col):
    """Composition example: pandas_udf feeding a built-in — normalize in
    Arrow batches, hash JVM-side."""
    return F.md5(normalize_text(col))
