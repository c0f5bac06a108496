"""Structured Streaming pipelines (SURVEY.md §2.9)."""

from .pipeline import (  # noqa: F401
    queue_stream,
    run_fetch_pipeline,
    windowed_event_counts,
)
