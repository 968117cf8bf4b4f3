"""Sink writers."""

from .forget import forget_keys  # noqa: F401
from .bucketed import (  # noqa: F401
    aligned,
    bucket_join,
    bucket_spec,
    exchange_count,
    write_bucketed,
)
from .shards import (  # noqa: F401
    epoch_shard_order,
    read_manifest,
    read_shard,
    rendezvous_shard,
    shard_assignment,
    verify_shards,
    write_training_shards,
)
from .writers import (  # noqa: F401
    start_parquet_stream_sink,
    write_json,
    write_partitioned_parquet,
)
