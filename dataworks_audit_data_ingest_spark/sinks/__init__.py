"""Sink writers."""

from .bucketed import (  # noqa: F401
    aligned,
    bucket_join,
    bucket_spec,
    exchange_count,
    write_bucketed,
)
from .writers import (  # noqa: F401
    start_parquet_stream_sink,
    write_json,
    write_partitioned_parquet,
)
