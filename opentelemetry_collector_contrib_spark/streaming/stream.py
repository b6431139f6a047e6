"""Structured Streaming realization of the pipeline (§2.10).

The reference's streaming semantics — tumbling intervals (logdedup,
interval processor, spanmetrics flush ticker), session-ish timeouts
(recombine force_flush_period, groupbytrace wait_duration), durable
offsets (fileconsumer checkpoints) — map onto Structured Streaming:
window()/watermark, session_window / applyInPandasWithState, and the
streaming checkpointLocation.

Batch remains the primary mode (north rule); these wrappers run the SAME
transformation functions in a micro-batch context via foreachBatch, so
operator logic is written once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def stream_pipeline(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint: str,
    sink_writer: Callable[[DataFrame, int], None],
    trigger_once: bool = True,
) -> DataStreamWriter:
    """readStream -> transform -> foreachBatch fan-out with checkpointing.

    foreachBatch lets one micro-batch write to N sinks (the routing
    connector's multi-consumer fan-out), which the single-sink writeStream
    API can't (SURVEY.md §4 'fan-out to N sinks')."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink_writer(transform(batch_df), batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer


def windowed_dedup(
    stream_df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming logdedup: watermarked tumbling-window dedup with counts
    (processor/logdedupprocessor semantics; late data beyond the watermark
    is dropped — the reference has no watermark, it flushes on a ticker)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval).alias("window"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("log_count"),
            F.min(ts_col).alias("first_observed"),
            F.max(ts_col).alias("last_observed"),
        )
    )


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    group_by: list[str],
    interval: str = "60 seconds",
    watermark: str = "120 seconds",
) -> DataFrame:
    """Streaming countconnector: per-interval record counts."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval).alias("window"), *group_by)
        .agg(F.count(F.lit(1)).alias("value"))
    )
