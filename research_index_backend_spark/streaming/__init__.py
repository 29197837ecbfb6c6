"""Structured Streaming extension (SURVEY.md §2.9 / M6)."""

from .windows import (  # noqa: F401
    foreach_batch_upsert,
    read_events_stream,
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
