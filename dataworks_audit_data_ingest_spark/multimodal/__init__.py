"""Multimodal column support: opaque binary payloads + typed metadata."""

from .ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_media_batches,
    fake_decode_record,
    with_media_payload,
)
