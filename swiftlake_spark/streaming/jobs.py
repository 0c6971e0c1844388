"""Streaming jobs over an event stream with the `events` schema
(event_id, ts, user_id, event_type, value, props).

All transformations are expressed once and work on BOTH batch and
streaming DataFrames (the Structured Streaming contract); the streaming
entry points add watermarks and sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding window counts+sums per event type.  On a
    streaming input the watermark bounds state; late rows beyond it drop
    (append-mode emits finalized windows only)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return e.groupBy(win.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def session_rollup(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window rollup per user (native session_window: state is
    per open session, merged on overlap)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return e.groupBy(F.session_window("ts", gap).alias("session"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def stream_into_table(stream: DataFrame, engine, table_name: str, checkpoint: str):
    """``writeStream.foreachBatch`` → lakehouse append per micro-batch.
    Returns the StreamingQuery (caller stops it)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.insert_into(table_name).dataframe(batch_df).execute()

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )
