"""Source readers for the engine's supported formats."""

from .readers import (  # noqa: F401
    read_binary_dir,
    read_csv,
    read_events_json,
    read_json,
    read_json_with_quarantine,
    read_parquet_table,
)
