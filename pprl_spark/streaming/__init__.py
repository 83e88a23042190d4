"""Structured Streaming stages.

The reference is pure request/response (no streaming); these wrappers run
the same deterministic encode kernel over an unbounded source — the
incremental-ingest shape for a continuously-crawled pages table.
"""

from ..spark.quality import streaming_quality_filter  # noqa: F401
from .encode_stream import (  # noqa: F401
    streaming_dedup_exact,
    streaming_heavy_hitters_by_key,
    streaming_hll_by_key,
    streaming_mask,
    streaming_windowed_counts,
)
