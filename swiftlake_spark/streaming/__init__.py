"""Structured Streaming extension (beyond the reference, which has no
streaming surface — SURVEY.md §2.B last row).

Batch analytics over ``events`` covers parity; this module adds the
streaming versions of the same rollups for pipelines that tail an event
feed: watermarked tumbling windows, session windows, and a
foreachBatch sink that appends micro-batches into a lakehouse table via
the batch transaction (exactly-once per micro-batch epoch id is the
caller's contract, as with any foreachBatch sink).
"""

from swiftlake_spark.streaming.jobs import (
    windowed_rollup,
    session_rollup,
    stateful_user_totals,
    dedup_within_watermark,
    enrich_with_dim,
    interval_join,
    stream_into_table,
    stream_upsert_into_table,
    consume_appends,
)

__all__ = [
    "windowed_rollup",
    "session_rollup",
    "stateful_user_totals",
    "dedup_within_watermark",
    "enrich_with_dim",
    "interval_join",
    "stream_into_table",
    "stream_upsert_into_table",
    "consume_appends",
]
