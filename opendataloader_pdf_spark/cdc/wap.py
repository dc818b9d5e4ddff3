"""Write-audit-publish (WAP) — staged commits, the Iceberg
branch-then-cherry-pick pattern over the sink's manifest log.

A staged view of the sink chains its commits under a ``STAGE`` pointer
instead of ``HEAD``: the replay engine runs UNCHANGED against the view
(same merge, same lineage, same checkpoint resume), but readers of the
table see nothing until ``publish`` atomically swaps HEAD to the staged
chain. Between stage and publish the caller audits the staged state
(row-count deltas, invariant queries, dedup checks — anything that reads
``staged.read()``); a failed audit ``abort``s, deleting the staged
manifests and every data file only they reference.

Scale notes: staging adds ZERO data-path cost — the same immutable
snapshot files are written either way; publish is one atomic rename-size
metadata write; abort deletes only staged files (manifest-driven, no
listing of live data). Crash safety: a crash before publish leaves HEAD
untouched (readers never saw the stage) and a dangling STAGE chain that
the next ``begin_staged`` can resume (the engine's batch_id checkpoint
lives in the staged manifest) or discard.
"""

from __future__ import annotations

import json
import os

from opendataloader_pdf_spark.cdc.storage import (
    ParquetMergeSink,
    _atomic_write,
    manifest_data_paths,
)

STAGE = "STAGE"
STAGE_BASE = "STAGE_BASE"


def _stage_path(sink: ParquetMergeSink) -> str:
    return os.path.join(sink.meta_dir, STAGE)


def _stage_base_path(sink: ParquetMergeSink) -> str:
    return os.path.join(sink.meta_dir, STAGE_BASE)


def _require_base_view(sink: ParquetMergeSink, op: str) -> None:
    """publish/abort must receive the BASE sink, not the staged view
    begin_staged returned: the staged instance's _head_path resolves to
    STAGE, so abort(staged) would compute head at the staged tip, delete
    nothing, and strand the staged manifests past HEAD forever."""
    if os.path.abspath(sink._head_path()) == os.path.abspath(_stage_path(sink)):
        raise ValueError(
            f"{op}() was passed the staged view — pass the base sink "
            f"(the object begin_staged was called ON, not the one it "
            f"returned)"
        )


def begin_staged(sink: ParquetMergeSink, resume: bool = False) -> ParquetMergeSink:
    """A staged view of the sink: commits chain under STAGE, invisible to
    HEAD readers. Pass the view to ReplayEngine (or merge directly); then
    ``publish`` or ``abort``. ``resume=True`` continues an existing
    staged chain (post-crash); default raises if one dangles.

    Caveat: patch-op streams advance the shared PendingStore during
    staging; aborting the stage does NOT rewind pending state — use WAP
    with full-write streams (the common backfill/correction shape), or
    point the staged engine at its own ``pending_path``."""
    sp = _stage_path(sink)
    if os.path.exists(sp) and not resume:
        raise ValueError(
            "a staged chain already exists — publish/abort it first, or "
            "pass resume=True to continue it"
        )
    if not os.path.exists(sp):
        # stage starts where HEAD is now; remember WHICH head, so publish
        # can detect any concurrent HEAD writer (even one that re-used
        # snapshot ids at or below the staged tip). STAGE_BASE is written
        # FIRST: a crash between the two writes then leaves a base file
        # with no STAGE pointer (harmless — rewritten here next time),
        # never a resumable STAGE chain missing the base publish() needs
        # for its concurrent-writer check.
        with open(sink._head_path()) as f:
            head_name = f.read().strip()
        _atomic_write(_stage_base_path(sink), head_name)
        _atomic_write(sp, head_name)

    class _Staged(type(sink)):
        def _head_path(self) -> str:  # noqa: D102
            return _stage_path(self)

    staged = object.__new__(_Staged)
    staged.__dict__.update(sink.__dict__)
    return staged


def staged_commits(sink: ParquetMergeSink) -> list[dict]:
    """Commit records on the staged chain not yet on HEAD (audit input)."""
    sp = _stage_path(sink)
    if not os.path.exists(sp):
        return []
    with open(sp) as f:
        name = f.read().strip()
    with open(os.path.join(sink.meta_dir, name)) as f:
        staged_m = json.load(f)
    head_sid = sink.manifest()["snapshot_id"]
    return [c for c in staged_m.get("commits", []) if c["snapshot_id"] > head_sid]


def publish(sink: ParquetMergeSink) -> dict:
    """Atomically swap HEAD to the staged chain — the audited commits
    become visible to every reader at once. Returns the published
    manifest. Raises if HEAD moved since the stage began (concurrent
    writer): WAP assumes one writer, same as the engine itself."""
    _require_base_view(sink, "publish")
    sp = _stage_path(sink)
    if not os.path.exists(sp):
        raise ValueError("no staged chain to publish")
    with open(sp) as f:
        staged_name = f.read().strip()
    with open(os.path.join(sink.meta_dir, staged_name)) as f:
        staged_m = json.load(f)
    with open(sink._head_path()) as f:
        head_now = f.read().strip()
    base_path = _stage_base_path(sink)
    if not os.path.exists(base_path):
        # base is written before STAGE, so a missing base means manual
        # tampering — without it the concurrent-writer check is blind
        raise ValueError(
            "STAGE exists but STAGE_BASE is missing — cannot verify the "
            "staged chain still descends from HEAD; abort and re-stage"
        )
    with open(base_path) as f:
        head_at_stage = f.read().strip()
    if head_now != head_at_stage:
        raise ValueError(
            f"HEAD moved from {head_at_stage} to {head_now} since the "
            f"stage began (concurrent writer) — the staged chain no "
            f"longer descends from HEAD; abort and re-stage"
        )
    _atomic_write(sink._head_path(), staged_name)
    os.remove(sp)
    os.remove(base_path)
    return staged_m


def abort(sink: ParquetMergeSink) -> dict:
    """Discard the staged chain: delete its manifests, every data file
    referenced ONLY by them, and their audit-table partitions. HEAD
    readers were never affected."""
    _require_base_view(sink, "abort")
    sp = _stage_path(sink)
    if not os.path.exists(sp):
        # a crash between the STAGE_BASE and STAGE writes can leave a
        # dangling base with no chain — reclaim it here
        base_path = _stage_base_path(sink)
        if os.path.exists(base_path):
            os.remove(base_path)
        return {"aborted_snapshots": [], "deleted_files": 0}
    with open(sp) as f:
        staged_name = f.read().strip()
    with open(os.path.join(sink.meta_dir, staged_name)) as f:
        staged_m = json.load(f)
    head_m = sink.manifest()
    head_sid = head_m["snapshot_id"]
    staged_sids = [
        s for s in range(head_sid + 1, staged_m["snapshot_id"] + 1)
        if os.path.exists(os.path.join(sink.meta_dir, f"manifest-{s}.json"))
    ]

    paths_of = manifest_data_paths
    live = paths_of(head_m)
    # live also includes every OLDER retained manifest's files
    for name in os.listdir(sink.meta_dir):
        if name.startswith("manifest-") and name.endswith(".json"):
            s = int(name[len("manifest-"):-len(".json")])
            if s <= head_sid:
                with open(os.path.join(sink.meta_dir, name)) as f:
                    live |= paths_of(json.load(f))
    dead = set()
    for s in staged_sids:
        with open(os.path.join(sink.meta_dir, f"manifest-{s}.json")) as f:
            dead |= paths_of(json.load(f))
    dead -= live
    deleted = 0
    for rel in sorted(dead):
        full = os.path.join(sink.data_dir, rel)
        if not os.path.isdir(full):
            continue
        for fn in os.listdir(full):
            os.remove(os.path.join(full, fn))
            deleted += 1
        os.rmdir(full)
    # staged lineage rows describe commits that never published — drop
    # them so the audit table only covers visible history (a later
    # re-replay of the same batch slot rewrites the same partition)
    staged_batches = set()
    for s in staged_sids:
        p = os.path.join(sink.meta_dir, f"manifest-{s}.json")
        with open(p) as f:
            for c in json.load(f).get("commits", []):
                # compaction commits (MoR) carry no batch_id — they have
                # no audit partition to drop
                if c["snapshot_id"] > head_sid and c.get("batch_id") is not None:
                    staged_batches.add(c["batch_id"])
        os.remove(p)
    import shutil as _shutil

    for b in staged_batches:
        adir = os.path.join(sink.audit_dir, f"batch_id={b}")
        if os.path.isdir(adir):
            _shutil.rmtree(adir)
    os.remove(sp)
    base_path = _stage_base_path(sink)
    if os.path.exists(base_path):
        os.remove(base_path)
    # aborted snapshot dirs may be left holding only Spark write markers
    # (_SUCCESS / hidden checksums) once their bucket dirs are gone —
    # sweep the markers too so the abort leaves no husk on disk.
    # MoR staged commits write delta-<sid> dirs instead of snap-<sid>,
    # so both prefixes are swept.
    for s in staged_sids:
        for prefix in ("snap", "delta"):
            sdir = os.path.join(sink.data_dir, f"{prefix}-{s}")
            if os.path.isdir(sdir):
                left = os.listdir(sdir)
                if all(os.path.isfile(os.path.join(sdir, n))
                       and (n.startswith("_") or n.startswith("."))
                       for n in left):
                    for n in left:
                        os.remove(os.path.join(sdir, n))
    # empty snapshot dirs left by removed buckets (a never-written sink
    # has no data dir at all — nothing to sweep)
    for name in os.listdir(sink.data_dir) if os.path.isdir(sink.data_dir) else []:
        full = os.path.join(sink.data_dir, name)
        if os.path.isdir(full) and not os.listdir(full):
            os.rmdir(full)
    return {"aborted_snapshots": staged_sids, "deleted_files": deleted}
