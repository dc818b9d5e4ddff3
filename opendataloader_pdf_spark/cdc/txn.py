"""Multi-table transactions: publish staged chains on SEVERAL sinks
all-or-nothing.

The lake keeps derived tables next to the data table — the dedup
fingerprint index (queries.cdc_dedup_index), the packed-sequence index
(queries.cdc_pack_maintain), incremental MV stats. A reader that joins
the table against an index must never observe the table at snapshot N
and the index at N-1; at 10^10 events "rebuild the index if it looks
stale" is not a recovery strategy. Iceberg solves this with multi-table
transactions (catalog-level atomic swap of several table pointers); this
module is that pattern over the sink's manifest log, composed from the
existing WAP primitive.

Protocol — write-ahead journal + roll-forward:

1. Stage every participant with ``begin_staged`` and run its writes (the
   engine runs unchanged against each staged view).
2. ``commit_all(sinks)``: validate every participant is publishable
   (stage present, its recorded base still equals the sink's current
   HEAD — the same concurrent-writer check ``publish`` makes), then
   write ONE atomic journal file listing every participant's staged
   manifest name. The journal write is the commit point.
3. Publish each participant (each publish is a single atomic pointer
   rename), then delete the journal.

Crash safety (``recover(sinks)``):
- no journal → the txn never reached its commit point. Whatever stages
  dangle are untouched staged chains: resume or abort them per sink; no
  reader ever saw a partial txn.
- journal present → the txn IS committed; roll FORWARD by re-publishing
  every participant the crash left unpublished (idempotent: a
  participant whose HEAD already names its journaled manifest is
  skipped), then delete the journal.

Readers therefore always see either every participant pre-txn or every
participant post-txn, provided they call ``recover`` before reading
after an unclean shutdown — the same contract as a journaled filesystem
mount. Single-writer per table, same as the engine and WAP.

The journal lives in the FIRST sink's meta dir (the coordinator); pass
the same sink list, coordinator first, to commit and recover.
"""

from __future__ import annotations

import json
import os

from opendataloader_pdf_spark.cdc.storage import ParquetMergeSink, _atomic_write
from opendataloader_pdf_spark.cdc.wap import (
    _require_base_view,
    _stage_base_path,
    _stage_path,
    abort,
    publish,
)

TXN = "TXN"


def _txn_path(coordinator: ParquetMergeSink) -> str:
    return os.path.join(coordinator.meta_dir, TXN)


def in_flight(coordinator: ParquetMergeSink) -> bool:
    """True if a committed-but-not-fully-published txn journal exists."""
    return os.path.exists(_txn_path(coordinator))


def _staged_name(sink: ParquetMergeSink) -> str:
    with open(_stage_path(sink)) as f:
        return f.read().strip()


def _validate_publishable(sink: ParquetMergeSink) -> str:
    """The checks publish() would make, WITHOUT publishing — commit_all
    must know every participant will succeed before the commit point."""
    _require_base_view(sink, "commit_all")
    sp = _stage_path(sink)
    if not os.path.exists(sp):
        raise ValueError(f"no staged chain on {sink.meta_dir} — stage every "
                         f"participant before commit_all")
    bp = _stage_base_path(sink)
    if not os.path.exists(bp):
        raise ValueError(f"STAGE_BASE missing on {sink.meta_dir} — cannot "
                         f"verify the staged chain descends from HEAD")
    with open(bp) as f:
        base = f.read().strip()
    with open(sink._head_path()) as f:
        head = f.read().strip()
    if head != base:
        raise ValueError(f"HEAD moved on {sink.meta_dir} since its stage "
                         f"began (concurrent writer) — abort and re-stage")
    return _staged_name(sink)


def commit_all(sinks: list[ParquetMergeSink]) -> list[dict]:
    """Atomically publish every sink's staged chain. All-or-nothing: if
    any participant is unpublishable, NOTHING is published and every
    stage is left intact. Returns each participant's published manifest
    (coordinator first). If a previous txn journal dangles, raises —
    call ``recover`` first."""
    if not sinks:
        raise ValueError("commit_all needs at least one sink")
    coord = sinks[0]
    if in_flight(coord):
        raise ValueError("a transaction journal already exists — call "
                         "recover(sinks) before starting a new txn")
    staged = [_validate_publishable(s) for s in sinks]  # pre-commit gate
    journal = {
        "participants": [
            {"meta_dir": os.path.abspath(s.meta_dir), "staged": name}
            for s, name in zip(sinks, staged)
        ]
    }
    _atomic_write(_txn_path(coord), json.dumps(journal, indent=1))  # commit point
    out = [publish(s) for s in sinks]
    os.remove(_txn_path(coord))
    return out


def recover(sinks: list[ParquetMergeSink]) -> dict:
    """Roll a crashed txn forward (journal present) or report there is
    nothing to do (journal absent). Idempotent — safe to call on every
    startup before the first read."""
    coord = sinks[0]
    tp = _txn_path(coord)
    if not os.path.exists(tp):
        return {"state": "none", "rolled_forward": []}
    with open(tp) as f:
        journal = json.load(f)
    by_meta = {os.path.abspath(s.meta_dir): s for s in sinks}
    rolled = []
    for part in journal["participants"]:
        sink = by_meta.get(part["meta_dir"])
        if sink is None:
            raise ValueError(f"journal names participant {part['meta_dir']} "
                             f"that was not passed to recover()")
        with open(sink._head_path()) as f:
            head = f.read().strip()
        if head == part["staged"]:
            # this participant published before the crash; clear any
            # leftover stage pointers from a crash inside publish()
            for p in (_stage_path(sink), _stage_base_path(sink)):
                if os.path.exists(p):
                    os.remove(p)
            continue
        if not os.path.exists(_stage_path(sink)):
            raise ValueError(
                f"journaled participant {part['meta_dir']} has neither its "
                f"staged HEAD ({part['staged']}) nor a stage pointer — "
                f"manifest log tampered; manual repair required")
        publish(sink)
        rolled.append(part["meta_dir"])
    os.remove(tp)
    return {"state": "committed", "rolled_forward": rolled}


def abort_all(sinks: list[ParquetMergeSink]) -> list[dict]:
    """Abort every participant's stage (pre-commit-point only: raises if
    a txn journal exists — that txn is committed and must roll forward)."""
    if in_flight(sinks[0]):
        raise ValueError("transaction journal exists — the txn is committed; "
                         "call recover(sinks), it cannot be aborted")
    return [abort(s) for s in sinks if os.path.exists(_stage_path(s))]
