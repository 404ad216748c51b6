"""Structured Streaming surface (SURVEY §2.n)."""

from .ingest_stream import streaming_ingest, windowed_event_counts  # noqa: F401
