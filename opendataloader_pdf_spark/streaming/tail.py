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

Partial-update (op='patch') streams are supported through the same
PendingStore the batch engine uses (cdc/patches.py): orphan patches park
across micro-batches and the crash window between the merge commit and
the pending commit is safe — Structured Streaming re-delivers the
uncheckpointed batch, whose merge is an idempotent no-op and whose
re-consumed pending patches die by the LSN guard.
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
    disorder_window: int | None = None,
    quarantine: bool = False,
) -> list[int]:
    """Consume all currently-available files as micro-batches; returns the
    list of batch ids applied (empty on a fully caught-up resume).

    ``disorder_window``: set when the log's FILES arrive in delivery
    order with bounded |delivery_seq − lsn| (true of binlog/WAL segment
    dirs) — patches then hold back behind the watermark exactly as in the
    batch engine. Leave None for unordered file drops: patches apply onto
    the freshest predecessor seen so far (monotone-apply semantics; an
    intermediate full write arriving AFTER a fresher applied patch is
    treated as superseded)."""
    import os

    from opendataloader_pdf_spark.cdc.patches import (
        PendingStore,
        has_patch_columns,
        merge_pending,
        reduce_batch_patches,
        resolve_patches,
    )

    reg = registry or default_registry()
    if quarantine and not getattr(sink, "root", None):
        raise ValueError(
            "quarantine=True but the sink has no .root to hold the "
            "dead-letter table"
        )
    # delete-retention parity with ReplayEngine: once vacuum_tombstones
    # recorded a floor, sub-floor events must dead-letter (their
    # tombstones are physically gone — applying one could resurrect a
    # deleted key). Read once at tail start: the floor only moves via
    # maintenance, which requires quiesced writers.
    vac_floor = sink.manifest().get("vacuum_floor", -1) if sink.exists() else -1
    if vac_floor >= 0 and not getattr(sink, "root", None):
        raise ValueError(
            "sink has a vacuum_floor but no .root for the "
            "_retention_expired table"
        )
    applied: list[int] = []
    pending_store = (
        PendingStore(spark, os.path.join(sink.root, "_pending"), key=sink.key)
        if getattr(sink, "root", None) else None
    )
    # slot base: streaming epoch ids restart at 0 per checkpoint, but
    # the sink manifest's batch_id namespace is shared with the batch
    # ReplayEngine. Tailing a sink the batch engine already wrote (say
    # to batch_id N) with a FRESH checkpoint would make merge() no-op
    # epochs 0..N while the checkpoint still marks their files consumed
    # — silent data loss. Pin slot = base + epoch with base fixed at
    # CHECKPOINT creation (atomic SLOT_BASE file), so a resumed tail
    # keeps its original mapping; a pre-existing checkpoint without the
    # file keeps the legacy base of 0.
    from opendataloader_pdf_spark.cdc.storage import _atomic_write

    base_path = os.path.join(checkpoint_dir, "SLOT_BASE")
    if os.path.exists(base_path):
        with open(base_path) as f:
            slot_base = int(f.read().strip())
    elif os.path.isdir(os.path.join(checkpoint_dir, "offsets")):
        slot_base = 0  # legacy checkpoint predating SLOT_BASE
    else:
        slot_base = sink.last_batch_id() + 1 if sink.exists() else 0
        os.makedirs(checkpoint_dir, exist_ok=True)
        _atomic_write(base_path, str(slot_base))

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_id = slot_base + epoch_id  # manifest slot for this epoch
        from pyspark.sql import functions as F

        from opendataloader_pdf_spark.cdc.events import invalid_event_cond

        if vac_floor >= 0:
            # one narrow scan of a near-empty-by-contract predicate;
            # per-epoch overwrite dir keeps the dead-letter exactly-once
            # under checkpoint replay of a failed epoch
            exp_cond = F.col(sink.order) <= F.lit(vac_floor)
            if batch_df.filter(exp_cond).limit(1).count():
                batch_df.filter(exp_cond).write.mode("overwrite").parquet(
                    os.path.join(sink.root, "_retention_expired",
                                 f"batch=s{batch_id}")
                )
                batch_df = batch_df.filter(
                    F.col(sink.order).isNull() | ~exp_cond
                )
        patchable = has_patch_columns(batch_df) and pending_store is not None
        pending_prev, pending_n = (
            pending_store.read() if patchable else (None, 0)
        )
        # dead-letter parity with ReplayEngine(quarantine=True): the
        # invalid count rides the existing probe aggregate (valid-only
        # decision columns, same contract as the batch engine — clean
        # epochs pay one extra aggregate column, nothing else); the split
        # + per-epoch overwrite only run when bad rows exist, which keeps
        # the write exactly-once under checkpoint replay of a failed epoch.
        valid = (
            ~invalid_event_cond(sink.key, sink.order)
            if quarantine else F.lit(True)
        )
        probe_aggs = [F.sum(F.when(valid, 1).otherwise(0)).alias("n"),
                      F.max(F.when(valid, F.col("schema_version"))).alias("v"),
                      F.sum(F.when(~valid, 1).otherwise(0)).alias("inv")]
        if patchable:
            probe_aggs.append(
                F.max(
                    F.when(valid & (F.col("op") == "patch"), 1).otherwise(0)
                ).alias("p")
            )
            if disorder_window is not None:
                probe_aggs.append(F.max(F.when(valid, F.col("delivery_seq"))).alias("d"))
        row = batch_df.agg(*probe_aggs).collect()[0]
        if quarantine and row["inv"]:
            bad = invalid_event_cond(sink.key, sink.order)
            # same `batch=` partition column as the batch engine (one
            # readable dead-letter table on a shared sink); the `s` value
            # prefix keeps streaming epoch ids from colliding with batch
            # replay slot ids
            batch_df.filter(bad).write.mode("overwrite").parquet(
                os.path.join(sink.root, "_quarantine",
                             f"batch=s{batch_id}")
            )
            batch_df = batch_df.filter(~bad)
        if not row["n"] and not pending_n:
            return
        # empty batch with pending only: stay on the sink's current schema
        # (don't evolve to max(reg) before any event at that version lands)
        target_schema = (
            reg[int(row["v"])] if row["v"] is not None else sink.current_schema()
        )
        target = diff_schemas(sink.current_schema(), target_schema)
        sink.evolve_schema(target)
        if patchable and (row["p"] or pending_n):
            red = reduce_batch_patches(batch_df.drop("schema_version", "ts"))
            red = merge_pending(red, pending_prev)
            affected = sorted(
                r["bucket"]
                for r in sink._bucketed(red.select(sink.key))
                .select("bucket").distinct().collect()
            )
            floor = (
                int(row["d"]) - disorder_window
                if disorder_window is not None and row["d"] is not None
                else None
            )
            red, pending_next = resolve_patches(red, sink, affected,
                                                floor=floor)
            ok = sink.merge(sink._bucketed(red), batch_id=batch_id,
                            affected=affected)
            pending_store.write(batch_id, pending_next)
        else:
            drop = ["schema_version", "ts"] + (
                ["patch_start", "patch_del"]
                if has_patch_columns(batch_df) else []
            )
            reduced = reduce_batch(batch_df.drop(*drop), salted=salted)
            ok = sink.merge(reduced, batch_id=batch_id)
            if patchable:
                pending_store.write_empty(batch_id)
        if ok is not None:
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
