"""Structured Streaming ingest — the scheduled-crawl analog.

The reference crawls on a monthly cron, fanning one idempotent run per
source partition (/root/reference/userCode/defs.py:67-98).  The Spark
recast is a `Trigger.AvailableNow` streaming job over the files table:
each tick drains whatever new files have landed, extracts mentions
exactly-once (checkpointed offsets), and appends to the mentions table.
Watermarked windowed counts provide the per-source crawl telemetry the
reference derives from log parsing (lib/dagster.py:33-59).

All functions take/return DataFrames so batch tests can exercise the
same logic via the foreachBatch body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_mentions, with_content_sha


def stream_files(
    spark: SparkSession, source_dir: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet directory of `files` rows."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def mentions_stream(files_stream: DataFrame) -> DataFrame:
    """Streaming mention extraction (same operator as batch — narrow
    map, so it is streaming-safe with no watermark needed)."""
    return extract_mentions(with_content_sha(files_stream))


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """One `AvailableNow` drain: process all unseen input files, append
    mentions, commit offsets — rerunning after new files arrive
    processes only the delta (the streaming twin of the fingerprint
    anti-join resume)."""
    stream = mentions_stream(stream_files(spark, source_dir, schema))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    files_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-content ingest: duplicate payloads
    arriving within the watermark horizon are dropped by `content_sha`
    (the hash-keyed summoned-doc contract,
    /root/reference/docs/hdt.md:12-16, recast as a stream).

    `dropDuplicatesWithinWatermark` bounds the dedup state to the
    watermark horizon — at 100 TB/day the state store holds only the
    horizon's hashes, never full history (a plain streaming
    dropDuplicates would grow without bound)."""
    s = with_content_sha(files_stream)
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )


def run_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ingest_ts",
) -> None:
    """AvailableNow drain of the dedup stream (file source must carry
    an event-time column `ts_col`)."""
    stream = dedup_stream(stream_files(spark, source_dir, schema), ts_col=ts_col)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def run_dedup_ingest_to_catalog(
    spark: SparkSession,
    source_dir: str,
    schema,
    catalog,
    table: str,
    checkpoint_dir: str,
    ts_col: str = "ingest_ts",
) -> None:
    """AvailableNow drain of the dedup stream, sunk through
    `catalog.append` via foreachBatch: streamed ingest shares the
    snapshot log / incremental-read / time-travel semantics with batch
    writes instead of dropping bare parquet beside them (the
    reference's release artifacts land in the same versioned store
    whichever job produced them,
    /root/reference/userCode/lib/lakefs.py:60-111).

    Exactly-once: the streaming checkpoint commits source offsets per
    batch, and each batch becomes one snapshot whose properties carry
    the batch id — a replayed batch after a crash-before-offset-commit
    is visible (duplicate batch id) rather than silent."""
    stream = dedup_stream(stream_files(spark, source_dir, schema), ts_col=ts_col)

    def _sink(batch_df, batch_id: int) -> None:
        # stateful queries run an extra no-data batch to advance the
        # watermark; an empty append would be a noise snapshot
        if batch_df.isEmpty():
            return
        catalog.append(batch_df, table, properties={"stream_batch_id": batch_id})

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    watermark: str = "1 hour",
    max_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: right events attributed to
    the left event they follow within `max_delay` (click→conversion
    attribution; in the KG pipeline the same shape attributes
    alias-dictionary updates to the mention batches they affect).

    Both sides carry watermarks AND the join condition bounds
    right_ts within [left_ts, left_ts + max_delay] — together these
    let Spark evict buffered state past `watermark + max_delay`
    instead of holding both streams forever (state is bounded by the
    delay horizon, not the stream length: the property that matters at
    100 TB/day).
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[key])


def run_interval_join(
    spark: SparkSession,
    left_dir: str,
    left_schema,
    right_dir: str,
    right_schema,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    watermark: str = "1 hour",
    max_delay: str = "30 minutes",
) -> None:
    """AvailableNow drain of the stream-stream interval join."""
    joined = stream_stream_interval_join(
        stream_files(spark, left_dir, left_schema),
        stream_files(spark, right_dir, right_schema),
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        watermark=watermark,
        max_delay=max_delay,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SESSION windows: per-key activity bursts separated
    by ≥ `gap` of silence become one row each — the streaming twin of
    the batch sessionize query (queries.events_sessionize uses the
    lag-over-window formulation; this is the same contract expressed
    as a dynamic-gap window so state is merged incrementally and
    expired by the watermark instead of a full per-key sort).

    Scale note: state per key is the set of OPEN sessions only; the
    watermark closes and emits sessions whose gap has provably passed,
    so state is bounded by (active keys × open sessions), not history.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def run_session_counts(
    spark,
    src_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    """AvailableNow drain of session_window_counts over a file stream.
    Append mode: only watermark-closed sessions are emitted, so a
    second drain with later data can still extend sessions that were
    open at the first drain's horizon."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        session_window_counts(stream, gap=gap, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def windowed_source_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts (late data beyond the
    watermark is dropped — the reference's exit-3 'warn and continue'
    tolerance recast as bounded lateness)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n",
        )
    )
