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


def stateful_user_totals(
    events: DataFrame,
    *,
    watermark: str = "10 minutes",
    idle_timeout_minutes: int = 30,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running totals maintained across micro-batches.

    Emits one row per user per batch with the updated running state
    (``closed = false``); when the event-time watermark passes a user's
    idle timeout the state is evicted and a final ``closed = true`` row
    is emitted.  This is the pattern for operators Structured Streaming
    lacks natively (CDC accumulators, per-entity ML feature state).

    Scale: state is partitioned by the group key across executors and
    bounded by the timeout eviction; each batch shuffles only that
    batch's rows on ``user_id``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    out_schema = (
        "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
        "last_ts TIMESTAMP, closed BOOLEAN"
    )
    state_schema = "n_events BIGINT, total_value DOUBLE, last_ts_us BIGINT"
    timeout_ms = idle_timeout_minutes * 60 * 1000

    def fn(key: tuple, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, tot, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "total_value": tot,
                        "last_ts": pd.Timestamp(last_us, unit="us"),
                        "closed": True,
                    }
                ]
            )
            return
        n, tot, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            tot += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
        state.update((n, tot, last_us))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "total_value": tot,
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                    "closed": False,
                }
            ]
        )

    e = events.withWatermark("ts", watermark)
    return e.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming deduplication with bounded state
    (``dropDuplicatesWithinWatermark``): a second event with the same
    keys arriving inside the watermark horizon is dropped; state for a
    key is evicted once the watermark passes it, so memory is bounded by
    (arrival rate × watermark) instead of growing forever like plain
    ``dropDuplicates`` on a stream.

    This is the streaming half of the exact-dedup operator
    (operators/dedup.py) for pipelines that tail a feed into the
    lakehouse: dedup-on-ingest, then MinHash/SimHash near-dedup in
    batch.  On a batch DataFrame it degrades to plain dropDuplicates
    (same semantics when all data is present at once).
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join.  The static side is broadcast per
    micro-batch (re-resolved each batch, so a slowly-changing dim table
    picks up updates without restarting the query); the stream side
    never shuffles."""
    return stream.join(F.broadcast(dim), on, "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
) -> DataFrame:
    """Stream-stream inner join on ``key`` with an event-time interval
    condition: a right row matches a left row if it occurs within
    ``(left.ts, left.ts + max_delay]`` — the funnel/attribution shape
    (click within N minutes of impression).

    Both sides are watermarked so the join state is provably bounded:
    Spark evicts left rows once the right watermark passes
    ``left.ts + max_delay`` and vice versa.  Without the time bound the
    state would grow forever; this is the required pattern for
    stream-stream joins at scale.

    Columns are prefixed ``l_`` / ``r_`` to avoid ambiguity.
    """
    l = left.withWatermark("ts", left_watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_type").alias("l_event_type"),
    )
    r = right.withWatermark("ts", right_watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_type").alias("r_event_type"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner")


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


def consume_appends(
    table, process, *, cursor_path: str, max_batches: int | None = None
) -> int:
    """Exactly-once micro-batch consumption of a lakehouse table's
    appends — the read-side complement of :func:`stream_into_table`
    (CDC feed pattern; Iceberg's incremental processing contract).

    ``process(batch_df, snapshot)`` is called once per append snapshot
    newer than the persisted cursor, oldest first.  The cursor (last
    fully processed snapshot id) is written via atomic rename only
    AFTER ``process`` returns, so a crash between processing and cursor
    write replays exactly one batch — the same at-least-once-with-
    idempotent-sink contract Structured Streaming checkpoints give.

    Overwrite/delete/replace snapshots in the feed raise: appends-only
    consumption is ill-defined across rewrites, and the caller must
    resync with a full refresh (matching ``Table.incremental_scan``).
    Returns the number of batches processed.
    """
    import json
    import os

    from swiftlake_spark.tables.metadata import ValidationError

    table = table.refresh()
    head = table.meta.current_snapshot()
    try:
        with open(cursor_path) as f:
            cur = json.load(f)["snapshot_id"]
    except FileNotFoundError:
        cur = None

    chain = table._ancestry(head)[::-1]  # oldest → newest
    if cur is not None:
        ids = [s.snapshot_id for s in chain]
        if cur not in ids:
            raise ValidationError(
                f"cursor snapshot {cur} is no longer in the branch history "
                "(expired or rewritten); full refresh required"
            )
        chain = chain[ids.index(cur) + 1 :]

    n = 0
    for s in chain:
        if max_batches is not None and n >= max_batches:
            break
        if s.operation != "append":
            raise ValidationError(
                f"feed hit non-append snapshot {s.snapshot_id} "
                f"({s.operation}); full refresh required"
            )
        process(table.snapshot_changes(s.snapshot_id), s)
        tmp = f"{cursor_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": s.snapshot_id}, f)
        os.replace(tmp, cursor_path)
        n += 1
    return n


def stream_upsert_into_table(
    stream: DataFrame,
    engine,
    table_name: str,
    key_columns: list[str],
    checkpoint: str,
    *,
    version_column: str | None = None,
    op_column: str | None = None,
    delete_value=None,
):
    """``writeStream.foreachBatch`` → SCD1 changes-merge per micro-batch:
    the streaming CDC-apply pattern (upserts, and deletes when
    ``op_column``/``delete_value`` mark them).

    Micro-batches don't order rows, so with ``version_column`` the
    max-version row per key inside a batch wins; without it the batch
    must be unique per key (the merge cardinality check enforces this).
    The merge boundary is derived from the batch's own key values
    (``table_filter_columns``), so each batch rewrites only files
    containing touched keys — at 100 TB a micro-batch touches a handful
    of files, not the table.  Returns the StreamingQuery.
    """
    from pyspark.sql import Window

    if op_column is not None and delete_value is None:
        raise ValueError(
            "op_column requires delete_value (a None marker would drop "
            "every upsert via SQL three-valued logic)"
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = batch_df
        if version_column is not None:
            w = Window.partitionBy(*key_columns).orderBy(
                F.col(version_column).desc()
            )
            b = (
                b.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                # keep the version column: if it IS a table column the
                # merge needs it; if not, the merge's projection drops it
                .drop("__rn")
            )
        oc, dv = op_column, delete_value
        if oc is None:
            # pure-upsert batch: changes mode requires an operation-type
            # column, so stamp every row as an upsert with a delete
            # sentinel no row carries
            oc, dv = "__op_upsert__", "__never__"
            b = b.withColumn(oc, F.lit("U"))
        m = (
            engine.apply_changes_as_scd1(table_name)
            .table_filter_columns(list(key_columns))
            .source_dataframe(b)
            .key_columns(list(key_columns))
            .operation_type_column(oc, dv)
        )
        m.execute()

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )
