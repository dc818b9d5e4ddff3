"""Watermarked event-time windowed aggregation over the change stream.

The CDC merge path deliberately ignores event time (ordering authority is
the LSN — SURVEY.md §2.9), but the *monitoring* side of an ingest
pipeline is exactly where watermarks + windowed aggs belong: per-window
ingest activity (events, docs touched, token volume, ops mix) computed
incrementally, with bounded state, tolerating late arrivals up to the
watermark delay and dropping anything later.

Shape (idiomatic Structured Streaming — state is managed by Spark, no
custom operator needed):

    readStream(parquet log)
      → withWatermark("ts", delay)
      → groupBy(window("ts", size), "op").agg(...)
      → writeStream append → parquet

Append output mode is the scale-correct choice: a window row is emitted
exactly once, when the watermark passes its end — downstream consumers
(dashboards, alerting joins) see each window as an immutable fact, and
streaming state holds only the open windows (bounded by
delay/size windows per op value, regardless of log size).

Late-data semantics (pinned by test_streaming_windows.py): the watermark
is a FINALITY guarantee, not an eager filter. A window's state is
evicted (and the row emitted) at the end of the first micro-batch whose
starting watermark passes the window end; a late row landing in that
same batch is still absorbed, while one landing in any later batch is
dropped (visible as numRowsDroppedByWatermark in query progress). Size
the delay at ≥ the source's disorder bound — for the CDC log that is
DISORDER_WINDOW seconds, since ts tracks lsn 1:1 in the synthetic log.

Distinct docs per window uses ``approx_count_distinct``: exact distinct
over an unbounded key set is unbounded state in streaming; the HLL
sketch is mergeable across partitions, which is what survives at 1000
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.datagen import EVENT_SCHEMA


def windowed_activity(
    events: DataFrame,
    window_size: str = "10 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Event-time windowed ingest-activity aggregate (works on both a
    streaming and a batch frame — the batch form is the test oracle).

    Returns one row per (window, op): event count, approx distinct docs,
    token volume, max lsn seen (the replay-progress high-watermark of
    that window's events)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_size).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
            F.sum("n_tok").alias("tok_volume"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "op", "n_events", "n_docs_approx", "tok_volume", "max_lsn",
        )
    )


def run_windowed_activity(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_size: str = "10 seconds",
    watermark_delay: str = "30 seconds",
    max_files_per_trigger: int = 4,
    event_schema: T.StructType = EVENT_SCHEMA,
) -> DataFrame:
    """Tail ``events_dir`` with Trigger.AvailableNow, append finalized
    windows to ``out_dir``; returns the materialized result frame.

    Append semantics on AvailableNow: only windows whose end the final
    watermark (max seen ts − delay) has passed are emitted; the open tail
    stays in checkpointed state and is emitted by a later run once
    enough event time accumulates — re-running on a grown log resumes
    from the checkpoint and never re-emits a window."""
    stream = (
        spark.readStream.schema(event_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        windowed_activity(stream, window_size, watermark_delay)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir, format="parquet")
    )
    q.awaitTermination()
    # derive the result schema from the batch twin instead of inferring
    # from files: a young log whose event-time span hasn't pushed the
    # watermark past any window end finalizes NOTHING — the sink then
    # holds only _spark_metadata, and schema inference would throw
    # UNABLE_TO_INFER_SCHEMA instead of returning the documented empty
    # frame ("the open tail is emitted by a later run").
    result_schema = windowed_activity(
        spark.createDataFrame([], event_schema),
        window_size, watermark_delay,
    ).schema
    return spark.read.schema(result_schema).parquet(out_dir)
