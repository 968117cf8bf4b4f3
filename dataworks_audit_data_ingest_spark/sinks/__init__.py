"""Sink writers."""

from .writers import (  # noqa: F401
    start_parquet_stream_sink,
    write_json,
    write_partitioned_parquet,
)
