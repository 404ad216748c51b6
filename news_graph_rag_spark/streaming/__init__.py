"""Structured Streaming surface (SURVEY §2.n)."""

from .ingest_stream import (  # noqa: F401
    stream_stream_interval_join,
    streaming_dedup,
    streaming_ingest,
    windowed_event_counts,
)
