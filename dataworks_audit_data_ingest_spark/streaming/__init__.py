"""Structured Streaming surface (SURVEY.md §7 M3)."""

from .jobs import (  # noqa: F401
    dedup_events_within_watermark,
    sessionized_events,
    sliding_user_counts,
    start_encrypted_ingest_stream,
    start_synthetic_encrypted_ingest_stream,
    stream_events_json,
    synthetic_event_records,
    tumbling_event_counts,
)
from .kafka import parse_kafka_events, read_kafka  # noqa: F401
from .stateful import (  # noqa: F401
    running_user_profiles,
    running_user_profiles_v2,
)
from .topk_job import (  # noqa: F401
    read_topk,
    start_topk_stream,
    topk_microbatch,
)
