"""Table maintenance: snapshot time travel, snapshot expiry, orphan-file
cleanup — the Iceberg-parity lifecycle operations around the sink's
manifest log.

Every commit already writes an immutable ``_meta/manifest-{sid}.json``
and swaps ``HEAD`` atomically; data files are immutable once committed.
That gives time travel for free (read any retained manifest) and makes
expiry a pure metadata decision: a data file is live iff some RETAINED
manifest references it.

Reference parity: the reference regenerates its golden output dir and
diffs against the previous run (IntegrationTest.java:42-52) — the
"previous run" role is played here by a retained snapshot; expiry is the
reference's overwrite step made explicit and safe.

Scale notes: all three operations are manifest-driven — file sets come
from JSON on the driver, never from listing data at scale; the only
Spark job is the optional time-travel read itself. Deletion cost is
O(expired files), and concurrent READERS of an expired snapshot are the
same hazard Iceberg documents: expire only past every reader's horizon.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from opendataloader_pdf_spark.cdc.storage import (
    ParquetMergeSink,
    manifest_data_paths,
)


def _manifest_at(sink: ParquetMergeSink, snapshot_id: int) -> dict:
    path = os.path.join(sink.meta_dir, f"manifest-{snapshot_id}.json")
    if not os.path.exists(path):
        raise ValueError(
            f"snapshot {snapshot_id} is not retained (expired or never "
            f"committed); retained: {sorted(retained_snapshots(sink))}"
        )
    with open(path) as f:
        return json.load(f)


def retained_snapshots(sink: ParquetMergeSink) -> list[int]:
    """Snapshot ids whose manifests are still on disk (time-travelable)."""
    out = []
    for name in os.listdir(sink.meta_dir):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-"):-len(".json")]))
    return sorted(out)


def pinned_view(sink: ParquetMergeSink, snapshot_id: int) -> ParquetMergeSink:
    """Snapshot-pinned shallow view of the sink: same spark/root/config,
    but ``manifest()`` returns the retained manifest of ``snapshot_id``
    forever. THE single implementation of the pin trick — time travel,
    tag reads, and the changelog's two-sided diff all build on it."""
    m = _manifest_at(sink, snapshot_id)

    class _Pinned(type(sink)):
        def manifest(self) -> dict:  # noqa: D102
            return m

    pinned = object.__new__(_Pinned)
    pinned.__dict__.update(sink.__dict__)
    return pinned


def read_at(sink: ParquetMergeSink, snapshot_id: int,
            include_deleted: bool = False) -> DataFrame:
    """Time-travel read: the table as of ``snapshot_id``.

    Implemented by swapping the manifest the sink's own ``read`` uses —
    a snapshot-pinned shallow view of the same sink object, so bucket
    pruning, schema alignment, and (for a merge-on-read sink) delta
    resolution all behave exactly as a HEAD read of that era did."""
    return pinned_view(sink, snapshot_id).read(include_deleted=include_deleted)


def schema_at(sink: ParquetMergeSink, snapshot_id: int):
    """The table schema as of ``snapshot_id`` (for replica bootstraps)."""
    import json as _json

    from pyspark.sql import types as T

    m = _manifest_at(sink, snapshot_id)
    return T.StructType.fromJson(_json.loads(m["schemas"][str(m["schema_id"])]))


def tag(sink: ParquetMergeSink, name: str,
        snapshot_id: int | None = None) -> int:
    """Pin a retained snapshot under a name (Iceberg tag analog) —
    ``read_tag`` resolves it and ``expire_snapshots`` will NOT drop it,
    so a tag is a durable reader horizon (e.g. the exact table state a
    training run consumed). Returns the tagged snapshot id."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
        raise ValueError(f"invalid tag name {name!r}")
    sid = sink.snapshot_id() if snapshot_id is None else snapshot_id
    _manifest_at(sink, sid)  # must be retained
    from opendataloader_pdf_spark.cdc.storage import _atomic_write

    _atomic_write(os.path.join(sink.meta_dir, f"ref-{name}"), str(sid))
    return sid


def tags(sink: ParquetMergeSink) -> dict[str, int]:
    """All named refs → snapshot id."""
    out: dict[str, int] = {}
    for fn in os.listdir(sink.meta_dir):
        # skip _atomic_write temp leftovers (ref-<name>.tmp.<hex> from a
        # crash mid-tag) — reading one would raise or pin a phantom tag
        if fn.startswith("ref-") and ".tmp." not in fn:
            with open(os.path.join(sink.meta_dir, fn)) as f:
                out[fn[len("ref-"):]] = int(f.read().strip())
    return out


def drop_tag(sink: ParquetMergeSink, name: str) -> None:
    path = os.path.join(sink.meta_dir, f"ref-{name}")
    if os.path.exists(path):
        os.remove(path)


def read_tag(sink: ParquetMergeSink, name: str,
             include_deleted: bool = False) -> DataFrame:
    """Time-travel read of the tagged snapshot."""
    all_tags = tags(sink)
    if name not in all_tags:
        raise ValueError(f"unknown tag {name!r}; have {sorted(all_tags)}")
    return read_at(sink, all_tags[name], include_deleted=include_deleted)


def rescale_buckets(sink: ParquetMergeSink, new_n_buckets: int) -> dict:
    """Rewrite the table under a new hash-bucket count — the partition-
    evolution operation a growing table needs (64 buckets sized for 1 TB
    are a skew/parallelism ceiling at 100 TB).

    One full-table job: read the resolved state (tombstones INCLUDED —
    their LSN guards must survive, or a late out-of-order event could
    resurrect a deleted row), re-bucket with the new count, write as a
    fresh snapshot, commit. The new count is recorded in the manifest
    (``n_buckets``), which every reopened sink adopts — callers never
    pass it again. For a merge-on-read sink the rewrite folds all delta
    files into the new base, so rescale doubles as full compaction.

    Not concurrency-safe with an in-flight replay (same rule as Iceberg's
    partition-spec change: quiesce writers first). Time travel across the
    rescale works — old manifests keep the old bucket map — and a
    ``changes_between`` spanning it reports no rows (every bucket path
    changes, but no lsn moves). Returns the commit record."""
    import time

    # same quiesce-writers contract as Iceberg's partition-spec change: a
    # dangling STAGE chain shares the manifest-{sid} filename namespace
    # with HEAD, so committing head_sid+1 here would overwrite the staged
    # chain's first manifest and corrupt its checkpoint
    if os.path.exists(os.path.join(sink.meta_dir, "STAGE")):
        raise ValueError(
            "a staged (WAP) chain exists — publish or abort it before "
            "rescaling; staged and HEAD commits share the manifest "
            "namespace"
        )

    m = sink.manifest()  # adopts current n_buckets
    old_n = sink.n_buckets
    if new_n_buckets == old_n:
        return {"snapshot_id": m["snapshot_id"], "rescale": [old_n, old_n],
                "noop": True}
    if new_n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {new_n_buckets}")

    # resolved state incl. tombstones, aligned to the current schema
    df = sink.read(include_deleted=True)
    sid = m["snapshot_id"] + 1
    snap_rel = f"snap-{sid}"
    snap_dir = os.path.join(sink.data_dir, snap_rel)
    table_cols = [f.name for f in sink.current_schema().fields]

    sink.n_buckets = new_n_buckets  # bucket_of now uses the new count
    out = sink._bucketed(df).select(*table_cols, "_deleted", "bucket")
    (
        out.repartition(new_n_buckets, "bucket")
        .sortWithinPartitions(sink.key)
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(snap_dir)
    )
    buckets: dict[str, dict] = {}
    for b in range(new_n_buckets):
        d = os.path.join(snap_dir, f"bucket={b}")
        if os.path.isdir(d):
            buckets[str(b)] = {"path": f"{snap_rel}/bucket={b}",
                               "schema_id": m["schema_id"],
                               "rows": sink._dir_rows(d)}
    m["buckets"] = buckets
    m["snapshot_id"] = sid
    m["n_buckets"] = new_n_buckets
    # batch_id=None: a rescale is a metadata/compaction commit, not a
    # replay batch — stamping the last replay batch_id here would make
    # wap.abort treat a staged rescale as owning that batch's (already
    # published) audit partition and delete visible lineage
    rec = {"batch_id": None, "snapshot_id": sid,
           "buckets": sorted(int(b) for b in buckets),
           "rescale": [old_n, new_n_buckets], "wall_ts": time.time()}
    m["commits"].append(rec)
    sink._commit(m)
    return rec


def expire_snapshots(sink: ParquetMergeSink, keep_last: int = 2,
                     dry_run: bool = False) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete every
    data file no retained manifest references.

    Returns {"expired": [...sids], "deleted_files": n, "freed_bytes": n}.
    The HEAD manifest is always retained. Crash-safe: manifests are
    removed only AFTER the files they exclusively referenced are gone —
    a crash mid-way leaves extra (still-referenced or orphan) files,
    never a retained manifest with missing files."""
    head_sid = sink.snapshot_id()
    # a dangling staged chain (WAP) owns every manifest past HEAD: those
    # are not published history — they neither count toward keep_last nor
    # get expired here (wap.abort owns their lifecycle)
    all_sids = [s for s in retained_snapshots(sink) if s <= head_sid]
    # tagged snapshots are durable reader horizons — never expired
    keep = set(all_sids[-keep_last:]) | {head_sid} | set(tags(sink).values())
    expired = [s for s in all_sids if s not in keep]
    if not expired:
        return {"expired": [], "deleted_files": 0, "freed_bytes": 0}

    def live_paths(sids) -> set[str]:
        out: set[str] = set()
        for sid in sids:
            out |= manifest_data_paths(_manifest_at(sink, sid))
        return out

    live = live_paths(sorted(keep))
    dead = live_paths(expired) - live
    deleted = 0
    freed = 0
    for rel in sorted(dead):
        full = os.path.join(sink.data_dir, rel)
        if not os.path.isdir(full):
            continue
        for f in os.listdir(full):
            fp = os.path.join(full, f)
            freed += os.path.getsize(fp)
            deleted += 1
            if not dry_run:
                os.remove(fp)
        if not dry_run:
            os.rmdir(full)
    if not dry_run:
        for sid in expired:
            os.remove(os.path.join(sink.meta_dir, f"manifest-{sid}.json"))
        # snapshot dirs whose every bucket dir is gone
        for name in os.listdir(sink.data_dir):
            full = os.path.join(sink.data_dir, name)
            if os.path.isdir(full) and not os.listdir(full):
                os.rmdir(full)
        # trim the live manifest's commit log to retained history:
        # commits below the oldest retained snapshot point at manifests
        # that no longer exist, so changes_between can't use them — and
        # carrying them forward forever makes every manifest parse and
        # rewrite O(total table history) on a continuously-ingesting
        # table. Same-sid rewrite under the CAS guard (single-writer
        # maintenance, like rescale/vacuum).
        oldest = min(keep)
        m = sink.manifest()
        n_before = len(m["commits"])
        m["commits"] = [c for c in m["commits"]
                        if c["snapshot_id"] >= oldest]
        if len(m["commits"]) != n_before:
            sink._commit(m)
    return {"expired": expired, "deleted_files": deleted,
            "freed_bytes": freed}


def orphan_files(sink: ParquetMergeSink) -> list[str]:
    """Data files on disk referenced by NO retained manifest — crash
    leftovers (a write that died before its commit). Safe to delete once
    no in-flight commit could still be writing them."""
    live: set[str] = set()
    for sid in retained_snapshots(sink):
        live |= manifest_data_paths(_manifest_at(sink, sid))
    out: list[str] = []
    for snap in sorted(os.listdir(sink.data_dir)):
        snap_full = os.path.join(sink.data_dir, snap)
        if not os.path.isdir(snap_full):
            continue
        for bucket in sorted(os.listdir(snap_full)):
            if not os.path.isdir(os.path.join(snap_full, bucket)):
                continue  # _SUCCESS / .crc markers, not bucket dirs
            rel = f"{snap}/{bucket}"
            if rel not in live:
                out.append(rel)
    return out


def remove_orphans(sink: ParquetMergeSink) -> int:
    """Delete orphan data dirs; returns the number of files removed."""
    n = 0
    for rel in orphan_files(sink):
        full = os.path.join(sink.data_dir, rel)
        for f in os.listdir(full):
            os.remove(os.path.join(full, f))
            n += 1
        os.rmdir(full)
    return n


def vacuum_tombstones(sink: ParquetMergeSink, floor: int,
                      compact_first: bool = False) -> dict:
    """Physically remove tombstones with ``lsn <= floor`` — the delete-
    retention operation (Kafka log-compaction's ``delete.retention.ms``,
    Iceberg's delete-file expiry) a 10^10-event delete-churn stream
    needs: tombstones exist only to out-rank LATE stale events for their
    key, and under the bounded-disorder delivery contract no event with
    ``lsn <= watermark - disorder_window`` can still arrive — tombstones
    at or below that line are dead weight forever.

    Contract: ``floor`` must respect the disorder bound (caller passes
    ``applied_watermark - disorder_window``). The floor is recorded in
    the manifest (monotonic — a lower re-vacuum is a no-op) and the
    ReplayEngine ENFORCES it from then on: any arriving event with
    ``lsn <= vacuum_floor`` is beyond retention and dead-letters to
    ``_retention_expired`` instead of applying — without that guard, a
    stale update for a vacuumed key would find no row (and no tombstone
    to out-rank it) and silently resurrect the deleted document.

    Copy-on-write: rewrites ONLY buckets that actually hold removable
    tombstones (one narrow ``(_deleted, lsn, bucket)`` scan finds them);
    untouched buckets keep their files. Merge-on-read: a delta tombstone
    masks base-file rows, so dropping it without folding first would
    resurrect those rows — buckets with live deltas are refused unless
    ``compact_first=True`` folds them. Maintenance commit (no batch_id),
    same as compaction/rescale; time travel across it works.
    """
    import time as _time

    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(sink.meta_dir, "STAGE")):
        raise ValueError(
            "a staged (WAP) chain exists — publish or abort it before "
            "vacuuming; staged and HEAD commits share the manifest "
            "namespace"
        )
    m = sink.manifest()
    prev_floor = m.get("vacuum_floor", -1)
    if floor <= prev_floor:
        return {"snapshot_id": m["snapshot_id"], "removed": 0,
                "buckets": [], "floor": prev_floor, "noop": True}

    delta_buckets = sorted(
        int(b) for b, ent in m["buckets"].items() if ent.get("deltas")
    )
    if delta_buckets:
        if not compact_first:
            raise ValueError(
                f"buckets {delta_buckets} hold delta files whose "
                f"tombstones mask base rows — vacuum would resurrect "
                f"them; compact first (or pass compact_first=True)"
            )
        sink.compact(buckets=delta_buckets)
        m = sink.manifest()

    # ONE narrow scan (bucket, _deleted, lsn — column-pruned) finds the
    # buckets that actually hold removable tombstones
    full = sink.read(with_bucket=True, include_deleted=True)
    dead = F.coalesce(F.col("_deleted"), F.lit(False)) & (
        F.col(sink.order) <= F.lit(floor)
    )
    counts = (
        full.select("bucket", dead.alias("_dead"))
        .filter(F.col("_dead"))
        .groupBy("bucket").count().collect()
    )
    todo = sorted(int(r["bucket"]) for r in counts)
    removed = int(sum(r["count"] for r in counts))
    sid = m["snapshot_id"] + 1
    if todo:
        snap_rel = f"vac-{sid}"
        snap_dir = os.path.join(sink.data_dir, snap_rel)
        table_cols = [f.name for f in sink.current_schema().fields]
        kept = (
            sink.read(buckets=todo, with_bucket=True, include_deleted=True)
            .filter(~dead)
            .select(*table_cols, "_deleted", "bucket")
        )
        (
            kept.repartition(len(todo), "bucket")
            .sortWithinPartitions(sink.key)
            .write.partitionBy("bucket").mode("overwrite").parquet(snap_dir)
        )
        for b in todo:
            d = os.path.join(snap_dir, f"bucket={b}")
            if os.path.isdir(d):
                m["buckets"][str(b)] = {"path": f"{snap_rel}/bucket={b}",
                                        "schema_id": m["schema_id"],
                                        "rows": sink._dir_rows(d)}
            else:  # every row in the bucket was a removable tombstone
                m["buckets"].pop(str(b), None)
    m["snapshot_id"] = sid
    m["vacuum_floor"] = floor
    rec = {"batch_id": None, "snapshot_id": sid, "buckets": todo,
           "vacuum_floor": floor, "removed": removed,
           "wall_ts": _time.time()}
    m["commits"].append(rec)
    sink._commit(m)
    return rec
