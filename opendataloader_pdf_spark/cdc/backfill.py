"""Chunked concurrent backfill: onboard a pre-existing upstream table
into the lake WHILE tailing its change stream, without locks and
without a consistent full-table snapshot.

The DBLog problem (Andreoni et al., "DBLog: A Watermark Based
Change-Data-Capture Framework", Netflix 2019): a full-table select
takes hours-to-days on a large source; during that time the stream
keeps moving, so chunk K read at stream position c_K reflects a
DIFFERENT point in time than chunk K+1. DBLog brackets each chunk
select between low/high watermark events written into the log and
drops chunk rows whose keys changed inside the window, because its
target store cannot compare row versions.

An LSN-guarded MERGE sink makes that machinery a degenerate case:
stamp every row of a chunk with the stream position ``chunk_lsn`` at
which the select executed. The chunk row's value already folds every
upstream commit ≤ chunk_lsn, so

* a stream event with lsn ≤ chunk_lsn arriving before OR after the
  chunk is absorbed/stale-dropped by the guard — the chunk carries its
  effect;
* a stream event with lsn > chunk_lsn wins over the chunk row — the
  chunk predates it;
* a key deleted upstream at ≤ chunk_lsn is simply absent from the
  chunk, and its tombstone (if the stream delivered the delete) keeps
  later stale updates dead.

No watermark window, no key-set diffing, no pause of the tail: the
interleave schedule is just delivery-sequence slots, so the REAL replay
engine runs stream batches and chunk upserts through one log.

Scale notes
-----------
* Chunks are key-range/bucket slices of the source select — each chunk
  is an independent bounded read (the JDBC analog: WHERE bucket = K),
  so backfill parallelism and stream latency are tuned independently.
* ``as_chunk_events`` is pure projection (no shuffle, no Python); the
  chunk rows enter the same reduce+MERGE path as stream events and
  inherit its skew handling and bucket pruning.
* Memory is O(1) extra: no pending state, no key-set tracking — the
  version comparison IS the dedup (contrast DBLog's in-memory chunk
  buffer that must hold the window's change keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_chunk_events(chunk: DataFrame, chunk_lsn: int,
                    delivery_seq: int, key: str = "doc_id",
                    order: str = "lsn",
                    schema_version: int = 1) -> DataFrame:
    """Convert one backfill chunk (current upstream rows for a key
    slice, read at stream position ``chunk_lsn``) into upsert pseudo-
    events the replay engine applies like any batch.

    Every row gets ``op='insert'``, ``lsn=chunk_lsn`` (the position
    whose fold the chunk value embodies — the LSN guard then arbitrates
    against stream events exactly), and the caller-chosen
    ``delivery_seq`` slot that schedules the chunk into the interleaved
    log. Payload columns pass through untouched.
    """
    payload = [c for c in chunk.columns
               if c not in (key, order, "op", "delivery_seq")]
    out = chunk.select(
        F.col(key),
        F.lit(int(chunk_lsn)).cast("long").alias(order),
        F.lit("insert").alias("op"),
        *[F.col(c) for c in payload],
        F.lit(int(delivery_seq)).cast("long").alias("delivery_seq"),
    )
    # stamp the event-contract columns a raw upstream select doesn't
    # carry: a null schema_version would make invalid_event_cond flag
    # EVERY chunk row as malformed, so --backfill-dir + --quarantine
    # would silently dead-letter the entire onboarding
    if "schema_version" not in out.columns:
        out = out.withColumn("schema_version",
                             F.lit(int(schema_version)).cast("int"))
    if "ts" not in out.columns:
        out = out.withColumn("ts", F.current_timestamp())
    return out


def interleave_backfill_log(stream: DataFrame,
                            chunks: list[tuple[DataFrame, int]],
                            key: str = "doc_id",
                            order: str = "lsn") -> DataFrame:
    """Build ONE replayable log that interleaves backfill chunks into
    the stream: chunk i takes delivery_seq == its read position c_i, so
    under any delivery-seq batch slicing it lands in the same micro-
    batch as the last stream events it already absorbs (the in-batch
    LWW tie is value-identical by construction) and strictly before
    every fresher event. A single ``ReplayEngine.replay(log, ...)``
    then executes the whole onboarding schedule with ordinary
    exactly-once semantics — no barrier logic, no watermark window.

    ``chunks`` = [(chunk_df, chunk_lsn), ...]; ``stream`` must carry
    ``delivery_seq`` == its lsn (the usual tail contract).
    """
    out = stream
    for chunk, c in chunks:
        ev = as_chunk_events(chunk, c, delivery_seq=c, key=key, order=order)
        out = out.unionByName(ev, allowMissingColumns=True)
    return out
