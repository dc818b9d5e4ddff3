"""Structured Streaming tail: change-log directory → exactly-once sink.

The batch ReplayEngine (cdc/engine.py) replays a bounded log; this module
tails an unbounded one with Structured Streaming:

    readStream(parquet dir, maxFilesPerTrigger)
      → foreachBatch( schema-diff → dedup/LWW reduce → LSN-guarded MERGE )
      → Trigger.AvailableNow

Exactly-once = two layers (SURVEY.md §2.9):
* Spark's streaming checkpoint tracks source offsets (which files were
  consumed) — a restarted query resumes at the next unread batch;
* the sink manifest records committed batch_ids — if the job dies AFTER
  the merge commit but BEFORE the checkpoint write, the replayed
  foreachBatch is a no-op (sink.merge returns None for a seen batch_id).

Ordering correctness does NOT depend on delivery order: the MERGE is
LSN-guarded, so late/out-of-order micro-batches can never regress a row
(last-writer-wins by lsn, reference F2 semantics).

Watermarks are deliberately unused: ordering authority is the LSN column,
not event time (north rule; SURVEY.md §2.9 "correctness comes from
LWW-by-LSN, not event-time watermarks").

Partial-update (op='patch') streams need the cross-batch pending-patch
state the batch ReplayEngine maintains (cdc/patches.py); tail full-write
streams here, and replay patch-bearing logs with ReplayEngine (its
checkpointing covers the unbounded case batch-by-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc.engine import default_registry
from opendataloader_pdf_spark.cdc.events import reduce_batch
from opendataloader_pdf_spark.cdc.schema_evolution import diff_schemas
from opendataloader_pdf_spark.cdc.storage import ParquetMergeSink
from opendataloader_pdf_spark.datagen import EVENT_SCHEMA


def tail_available_now(
    spark: SparkSession,
    events_dir: str,
    sink: ParquetMergeSink,
    checkpoint_dir: str,
    registry: dict[int, T.StructType] | None = None,
    max_files_per_trigger: int = 4,
    event_schema: T.StructType = EVENT_SCHEMA,
    salted: bool = False,
) -> list[int]:
    """Consume all currently-available files as micro-batches; returns the
    list of batch ids applied (empty on a fully caught-up resume)."""
    reg = registry or default_registry()
    applied: list[int] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if not batch_df.head(1):
            return
        ver = batch_df.agg(F.max("schema_version").alias("v")).collect()[0]["v"]
        target = diff_schemas(sink.current_schema(), reg[int(ver)])
        sink.evolve_schema(target)
        reduced = reduce_batch(batch_df.drop("schema_version", "ts"), salted=salted)
        if sink.merge(reduced, batch_id=batch_id) is not None:
            applied.append(batch_id)

    stream = (
        spark.readStream.schema(event_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied
