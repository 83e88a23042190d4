"""Streaming encode + windowed aggregation.

``streaming_mask``: readStream → mask UDF → BINARY bloom column.  The
encode UDF is deterministic (seeded from broadcast config), so replays
after failure produce identical vectors and the parquet sink stays
exactly-once under Structured Streaming's checkpointed offsets.

``streaming_windowed_counts``: event-time tumbling-window counts with a
watermark for late data — the streaming counterpart of the batch
``events_hourly`` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MaskConfig
from ..spark.mask import mask

__all__ = ["streaming_mask", "streaming_windowed_counts"]


def streaming_mask(
    stream_df: DataFrame,
    cfg: MaskConfig,
    attributes: list[str],
    id_col: str = "id",
) -> DataFrame:
    """Apply the Bloom encode to a streaming DataFrame (same narrow
    projection as batch — mask() builds a plain column expression, so it
    composes with streaming plans unchanged)."""
    if not stream_df.isStreaming:
        raise ValueError("streaming_mask expects a streaming DataFrame")
    return mask(stream_df, cfg, attributes, id_col=id_col)


def streaming_windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts (late rows beyond the watermark
    are dropped; state is bounded)."""
    if not stream_df.isStreaming:
        raise ValueError("streaming_windowed_counts expects a streaming DataFrame")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
