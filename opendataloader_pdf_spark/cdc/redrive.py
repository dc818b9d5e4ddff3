"""Dead-letter re-drive: repair quarantined events and re-inject them
exactly-once.

``ReplayEngine(quarantine=True)`` diverts malformed rows (null key /
lsn / delivery_seq / schema_version, unknown op) to
``<table>/_quarantine/batch=<b>``.  The operational follow-up — fix the
producer bug, repair the captured rows, and replay them — is this
module.  Reference analog: the reference's CLI re-runs a document after
a parse failure with relaxed options (its ``--keep-line-breaks`` /
repair-pass family); at stream scale the same workflow is a dead-letter
queue re-drive (Kafka Connect DLQ, Kinesis re-drive), which is the
shape implemented here.

Exactly-once composition
------------------------
The re-drive is a NEW commit (``batch_id = last + 1``); it does not
rewind the offset checkpoint.  Safety comes from two engine invariants:

* the MERGE's strict LSN guard (``c.lsn > t.lsn``) makes re-applying a
  repaired event a stale no-op if a later event for the key already
  landed through the normal stream — and makes re-running the re-drive
  itself idempotent (equal LSN → stale);
* the commit-then-archive ordering below means a crash anywhere leaves
  the quarantine readable: re-running the re-drive re-reads the same
  rows and converges.

Crash windows (roll-forward, never roll-back):
  1. after MERGE, before archive  — quarantine unchanged; rerun
     re-merges (all-stale no-op) and archives.
  2. after archive, before the residual swap — ``_quarantine`` is
     gone but ``_quarantine_tmp`` holds the still-bad residue; the next
     call roll-forwards the rename before reading.

The vacuum retention floor is honored exactly like live replay: a
repaired event at or below the floor would resurrect a physically
vacuumed tombstone, so it is diverted to
``_retention_expired_redrive/commit=<batch_id>`` instead of applied.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc.events import (
    invalid_event_cond,
    last_writer_wins,
)
from opendataloader_pdf_spark.cdc.storage import ParquetMergeSink

#: event columns the reduce/merge path never ships (informational or
#: consumed upstream of the reduce)
_NON_PAYLOAD = ("schema_version", "ts", "batch", "ddl")


def _qdir(sink: ParquetMergeSink) -> str:
    root = getattr(sink, "root", None)
    if root is None:
        raise ValueError("re-drive needs a sink with a .root holding the "
                         "_quarantine dead-letter table")
    return os.path.join(root, "_quarantine")


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _, _, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def redrive_quarantine(
    spark: SparkSession,
    sink: ParquetMergeSink,
    repair: Callable[[DataFrame], DataFrame] | None = None,
    fail_before_archive: bool = False,
) -> dict:
    """Repair and re-inject the sink's dead-letter table exactly-once.

    ``repair`` maps the quarantined frame (event schema, plus the
    ``batch`` partition column of the dead-letter layout) to a repaired
    frame; rows still failing the malformed-event contract afterwards
    stay quarantined (``batch=-2`` — "residual after last re-drive").
    Omitting ``repair`` re-drives rows as captured — useful when the
    contract itself was relaxed (e.g. a new op became valid).

    Returns ``{"read", "repaired", "still_bad", "expired", "batch_id",
    "applied", "deleted", "inserted", "stale"}``; all-zero dict when the
    quarantine is empty.  ``fail_before_archive`` is the injected-crash
    hook for resumability tests (raises after the MERGE commit).
    """
    qdir = _qdir(sink)
    tmp = qdir + "_tmp"
    # crash window 2 roll-forward: archive happened, residual swap didn't
    if not os.path.isdir(qdir) and os.path.isdir(tmp):
        os.rename(tmp, qdir)

    out = {"read": 0, "repaired": 0, "still_bad": 0, "expired": 0,
           "batch_id": None, "applied": 0, "deleted": 0, "inserted": 0,
           "stale": 0}
    if not _has_parquet(qdir):
        return out

    q = spark.read.parquet(qdir)
    out["read"] = q.count()
    # cache the repaired frame: ~6 downstream actions (counts, the
    # MERGE, the residual/archive writes) would otherwise re-read the
    # quarantine and re-run the user repair end-to-end each time — and
    # a non-deterministic repair could make the merged, counted, and
    # archived row sets DISAGREE, breaking the exactly-once accounting
    r = (repair(q) if repair is not None else q).cache()
    missing = {sink.key, sink.order, "op", "delivery_seq",
               "schema_version"} - set(r.columns)
    if missing:
        r.unpersist()
        raise ValueError(f"repair dropped contract columns: {sorted(missing)}")

    bad_cond = invalid_event_cond(sink.key, sink.order)
    still_bad = r.filter(bad_cond)
    fixed = r.filter(~bad_cond)

    # retention floor: sub-floor repaired events are inadmissible (their
    # tombstones were vacuumed — applying them would resurrect deletes)
    floor = sink.manifest().get("vacuum_floor", -1) if sink.exists() else -1
    bid = sink.last_batch_id() + 1
    if floor >= 0:
        expired_cond = F.col(sink.order) <= F.lit(floor)
        exp = fixed.filter(expired_cond)
        out["expired"] = exp.count()
        if out["expired"]:
            # deterministic per-commit overwrite. A crash between the
            # MERGE and the archive retries under commit=<bid+1>, leaving
            # the same rows captured twice — harmless: the capture is
            # diagnostic (the rows also live in the archived quarantine);
            # dedupe on (key, lsn, delivery_seq) when reading the parent.
            exp.drop("batch").write.mode("overwrite").parquet(
                os.path.join(sink.root, "_retention_expired_redrive",
                             f"commit={bid}"))
        fixed = fixed.filter(~expired_cond)

    # UNCONDITIONAL op check (op is a guaranteed contract column): a
    # repair that drops patch_start must not slip its patch rows past
    # this guard — a splice applies onto the CURRENT row via the
    # engine's LSN-fold, not a plain LWW merge, so re-driving one here
    # would overwrite the full token array with the splice payload
    n_patch = fixed.filter(F.col("op") == "patch").count()
    if n_patch:
        raise ValueError(
            f"{n_patch} repaired rows carry op='patch'; re-drive "
            "patch events through ReplayEngine against the live "
            "stream ordering instead (a bare MERGE would clobber "
            "the spliced arrays)"
        )
    drop = [c for c in
            _NON_PAYLOAD + ("delivery_seq", "patch_start", "patch_del")
            if c in fixed.columns]
    # reduce under the SINK's key/order, not the defaults — the
    # contract check above validates sink.key/sink.order, so the
    # reduction must group by the same columns
    red = last_writer_wins(fixed.drop(*drop), key=sink.key,
                           order=sink.order)
    n_fixed = red.count()
    out["repaired"] = n_fixed
    if n_fixed:
        stats = sink.merge(sink._bucketed(red), batch_id=bid)
        out["batch_id"] = bid
        if stats:
            for k in ("applied", "deleted", "inserted", "stale"):
                out[k] = stats.get(k, 0)

    if fail_before_archive:
        from opendataloader_pdf_spark.cdc.engine import JobKilled
        raise JobKilled("injected kill between re-drive MERGE and archive")

    out["still_bad"] = still_bad.count()
    # residual first (to the side), then archive, then swap — every
    # prefix of this sequence leaves a readable quarantine or a
    # roll-forwardable tmp
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)  # leftover from a crashed attempt — stale
    if out["still_bad"]:
        still_bad.drop("batch").write.mode("overwrite").parquet(
            os.path.join(tmp, "batch=-2"))
    else:
        os.makedirs(tmp, exist_ok=True)
    archive = os.path.join(sink.root, "_quarantine_redriven", f"commit={bid}")
    os.makedirs(os.path.dirname(archive), exist_ok=True)
    if os.path.isdir(archive):
        import shutil
        shutil.rmtree(archive)  # crashed attempt of this same commit id
    os.rename(qdir, archive)
    os.rename(tmp, qdir)
    r.unpersist()
    return out
