"""Structured Streaming operators (SURVEY.md §2.9)."""

from .pipelines import (  # noqa: F401
    incremental_file_sync,
    stream_dedup_keep_first,
    stream_fifteen_minute_usage,
    stream_sessionize,
    stream_stream_join,
    stream_upsert,
)
