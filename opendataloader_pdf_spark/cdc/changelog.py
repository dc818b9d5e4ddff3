"""Incremental changelog reads — the CDF / Iceberg-incremental-scan
analog over the sink's snapshot log.

``changes_between(sink, a, b)`` returns the NET row-level changes between
two retained snapshots: what a downstream consumer must apply to move a
replica from state-at-a to state-at-b (insert / update / delete per key).
This is what Iceberg's incremental append scan + Delta's Change Data
Feed provide; here it is *derived* from the snapshots themselves, so it
needs no extra write-path bookkeeping and is exact even across
compaction or schema evolution.

Reference parity: the reference's incremental story is the golden-rerun
diff (IntegrationTest.java:42-52 — rerun, diff outputs); this module is
that diff as a first-class, bucket-pruned operator.

Scale notes (the 100 TB contract):

* **bucket-pruned** — only buckets whose manifest path CHANGED between
  the two snapshots are read, on both sides. A batch touching 1 % of
  keys ⇒ the diff scans ~2 × 1 % of the table, never the whole table.
  The changed-bucket set comes from the two manifests on the driver —
  no file listing, no data scan.
* **one shuffle** — both sides are read only for the changed buckets and
  joined full-outer on the key; everything else is column-level
  comparison inside the join's task. With n_buckets == shuffle
  partitions the two sides are already hash-aligned (storage.bucket_of
  == Spark's own hashpartitioning), so AQE can plan the join without a
  second exchange.
* **LSN-driven classification, no payload compare** — copy-on-write
  rewrites whole buckets, so most rows in a changed bucket are
  byte-identical; they are dropped by the ``lsn`` equality test alone
  (the engine's invariant: a row's lsn strictly increases on every
  applied change, and only on applied changes). Token arrays are never
  compared, so the wide columns stream through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc.maintenance import _manifest_at, pinned_view
from opendataloader_pdf_spark.cdc.storage import ParquetMergeSink

#: change-type values, Delta-CDF-style (net changes, post-image rows;
#: deletes carry the pre-image — the tombstone's payload is the delete
#: event's, not the last visible row's)
INSERT, UPDATE, DELETE = "insert", "update", "delete"


def changed_buckets(sink: ParquetMergeSink, from_snapshot: int,
                    to_snapshot: int) -> list[int]:
    """Buckets whose data path differs between the two manifests — the
    only buckets that can contain row changes. Driver-side metadata only."""
    ma = _manifest_at(sink, from_snapshot)["buckets"]
    mb = _manifest_at(sink, to_snapshot)["buckets"]

    def ident(ent: dict | None):
        if ent is None:
            return None
        # a bucket is unchanged iff its base path AND delta chain (MoR)
        # are identical
        return (ent.get("path"), tuple(d["path"] for d in ent.get("deltas", [])))

    out = []
    for b in set(ma) | set(mb):
        if ident(ma.get(b)) != ident(mb.get(b)):
            out.append(int(b))
    return sorted(out)


def commits_between(sink: ParquetMergeSink, from_snapshot: int,
                    to_snapshot: int | None = None) -> list[dict]:
    """Commit metadata in (from_snapshot, to_snapshot] — batch ids,
    snapshot ids, touched buckets — from the newest manifest's commit
    log. Driver-side only; feeds per-commit replays of the changelog."""
    to_snapshot = sink.snapshot_id() if to_snapshot is None else to_snapshot
    m = _manifest_at(sink, to_snapshot)
    return [
        c for c in m.get("commits", [])
        if from_snapshot < c["snapshot_id"] <= to_snapshot
    ]


def changes_between(
    sink: ParquetMergeSink,
    from_snapshot: int,
    to_snapshot: int | None = None,
    change_col: str = "_change_type",
    preimages: bool = False,
) -> DataFrame:
    """Net row-level changes between two retained snapshots.

    Returns the table's columns (at to_snapshot's schema) plus
    ``_change_type`` ∈ {insert, update, delete}:

    * insert — key visible at ``to`` but not at ``from`` (covers
      resurrection of a previously deleted key);
    * update — visible at both, with a higher lsn at ``to``;
    * delete — visible at ``from``, tombstoned at ``to``; the row carries
      the PRE-image payload (the last state the consumer saw) with the
      tombstone's lsn, so downstream deletes can be LSN-guarded too.

    With ``preimages=True`` every update emits TWO rows, Delta-CDF style
    (``update_preimage`` with the old payload at the old lsn, then
    ``update_postimage``) — what sign-decomposable downstream maintenance
    (incremental aggregates, see ``delta_counts``) needs. Emitted in one
    pass: the join is computed once and updates fan out via explode, so
    the option costs no extra scan or shuffle.

    Keys whose lsn did not move — including whole untouched buckets,
    which are pruned without being read — produce no row. A key inserted
    and deleted strictly inside the span nets to nothing, as CDF
    semantics require.
    """
    to_snapshot = sink.snapshot_id() if to_snapshot is None else to_snapshot
    if to_snapshot < from_snapshot:
        raise ValueError(
            f"to_snapshot {to_snapshot} precedes from_snapshot {from_snapshot}"
        )
    new_pin = pinned_view(sink, to_snapshot)
    schema = new_pin.current_schema()
    key, order = sink.key, sink.order
    payload = [f.name for f in schema.fields]

    if to_snapshot == from_snapshot:
        empty = T.StructType(
            list(schema.fields) + [T.StructField(change_col, T.StringType(), False)]
        )
        return sink.spark.createDataFrame([], empty)

    buckets = changed_buckets(sink, from_snapshot, to_snapshot)
    if not buckets:
        empty = T.StructType(
            list(schema.fields) + [T.StructField(change_col, T.StringType(), False)]
        )
        return sink.spark.createDataFrame([], empty)

    old_pin = pinned_view(sink, from_snapshot)
    # read ONLY the changed buckets on both sides, tombstones included
    # (the lsn guard lives on tombstones); align the old era's schema to
    # the new one so the diff compares like columns
    new = new_pin.read(buckets=buckets, include_deleted=True)
    old = sink._align(
        old_pin.read(buckets=buckets, include_deleted=True), schema
    )
    o = old.select(
        F.col(key).alias("_k"),
        F.col(order).alias("_old_lsn"),
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("_old_del"),
        *[F.col(c).alias(f"_old_{c}") for c in payload if c not in (key, order)],
    )
    n = new.select(
        *payload,
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("_new_del"),
    )

    j = n.join(o, n[key] == o["_k"], "full_outer")
    new_side = F.col(key).isNotNull()
    old_side = F.col("_k").isNotNull()
    moved = new_side & old_side & (F.col(order) > F.col("_old_lsn"))
    old_vis = old_side & ~F.col("_old_del")
    new_vis = new_side & ~F.col("_new_del")

    change = (
        # never visible before, visible now → insert (covers brand-new
        # keys AND resurrections of tombstoned ones)
        F.when(new_vis & ~old_vis & (~old_side | moved), F.lit(INSERT))
        # visible→visible with an lsn move → update
        .when(new_vis & old_vis & moved, F.lit(UPDATE))
        # visible→tombstoned → delete
        .when(old_vis & new_side & F.col("_new_del") & moved, F.lit(DELETE))
        # lsn unchanged / tombstone-to-tombstone / insert+delete within
        # the span → no net change
        .otherwise(F.lit(None))
    )
    j = j.withColumn(change_col, change).filter(F.col(change_col).isNotNull())

    def image(kind: str) -> "F.Column":
        # pre-images take every non-key column from the old side (old lsn
        # included for 'update_preimage'; the tombstone's NEW lsn for
        # 'delete' — downstream deletes stay LSN-guarded)
        fields = []
        for c in payload:
            if c == key:
                fields.append(F.col(key).alias(c))
            elif c == order:
                fields.append(
                    (F.col("_old_lsn") if kind == "pre" else F.col(order)).alias(c)
                )
            elif kind == "pre":
                fields.append(F.col(f"_old_{c}").alias(c))
            else:
                fields.append(
                    F.when(F.col(change_col) == DELETE, F.col(f"_old_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                )
        ct = (
            F.lit("update_preimage") if kind == "pre"
            else F.when(F.col(change_col) == UPDATE,
                        F.lit("update_postimage" if preimages else UPDATE))
            .otherwise(F.col(change_col))
        )
        return F.struct(*fields, ct.alias(change_col))

    if not preimages:
        return j.select(image("post").alias("_r")).select(
            *[F.col(f"_r.{c}").alias(c) for c in payload + [change_col]]
        )
    rows = F.when(
        F.col(change_col) == UPDATE, F.array(image("pre"), image("post"))
    ).otherwise(F.array(image("post")))
    return (
        j.select(F.explode(rows).alias("_r"))
        .select(*[F.col(f"_r.{c}").alias(c) for c in payload + [change_col]])
    )


def follow_changes(sink: ParquetMergeSink, from_snapshot: int,
                   to_snapshot: int | None = None):
    """Per-commit changelog frames in commit order — the tailing consumer
    shape (generator of ``(commit_record, DataFrame)``). Each frame is the
    net diff of exactly one commit, so a follower applying them in order
    replays the upstream's history; a crashed follower resumes from the
    last snapshot id it applied (pass it as ``from_snapshot``). Commits
    older than the retained-manifest horizon raise — expire upstream
    snapshots only past every follower's position, the same contract
    Iceberg documents for incremental consumers."""
    prev = from_snapshot
    for c in commits_between(sink, from_snapshot, to_snapshot):
        yield c, changes_between(sink, prev, c["snapshot_id"])
        prev = c["snapshot_id"]


def delta_counts(changes: DataFrame, group_cols: list[str],
                 measures: dict[str, "F.Column"] | None = None,
                 change_col: str = "_change_type") -> DataFrame:
    """Signed per-group contributions of a PRE-IMAGE changelog
    (``changes_between(..., preimages=True)``) to sum-decomposable
    aggregates — the incremental-materialized-view primitive: at 100 TB
    a downstream per-source stats table is maintained from the changed
    rows only, never recomputed from the full table.

    ``measures`` maps output column → expression over the row (default
    ``{"n_rows": lit(1)}``). insert/update_postimage add the measure,
    delete/update_preimage subtract it; one map-side-combinable groupBy.
    Compose with ``apply_delta_state`` to fold into the running state."""
    measures = measures or {"n_rows": F.lit(1)}
    sign = (
        F.when(F.col(change_col).isin(INSERT, "update_postimage"), F.lit(1))
        .when(F.col(change_col).isin(DELETE, "update_preimage"), F.lit(-1))
        .otherwise(F.lit(None))  # plain 'update' = post-only changelog
    )
    # fail loudly on a post-only changelog rather than silently
    # double-counting updates — the guard rides the sign expression
    # itself (raise_error on the first bad row), so validation costs no
    # second scan of the changelog
    guarded_sign = F.coalesce(
        sign,
        F.raise_error(
            F.lit(
                "delta_counts needs a pre-image changelog — call "
                "changes_between(..., preimages=True)"
            )
        ).cast("int"),
    )
    aggs = [
        F.sum(guarded_sign * expr).alias(name)
        for name, expr in measures.items()
    ]
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_delta_state(state: DataFrame, delta: DataFrame,
                      group_cols: list[str]) -> DataFrame:
    """Fold a ``delta_counts`` frame into the running aggregate state:
    full-outer on the group keys, numeric columns summed, groups whose
    every measure reaches zero dropped (the group disappeared). Both
    sides shuffle on the same keys — one exchange each, no wide data."""
    value_cols = [c for c in state.columns if c not in group_cols]
    d = delta.select(
        *group_cols, *[F.col(c).alias(f"_d_{c}") for c in value_cols]
    )
    j = state.join(d, on=list(group_cols), how="full_outer")
    out = j.select(
        *group_cols,
        *[
            (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))).alias(c)
            for c in value_cols
        ],
    )
    alive = None
    for c in value_cols:
        cond = F.col(c) != 0
        alive = cond if alive is None else (alive | cond)
    return out.filter(alive) if alive is not None else out


def apply_changes(changes: DataFrame, sink: ParquetMergeSink,
                  batch_id: int | None = None) -> dict | None:
    """Apply a changelog frame (from ``changes_between`` on an upstream
    table) to a downstream sink — the replication consumer half of CDF.
    ``_change_type`` maps straight onto the MERGE's op column; the LSN
    guard makes re-application idempotent. Columns the changelog carries
    that the replica lacks evolve its schema additively first (the
    upstream's schema evolution propagates through the changelog, same
    registry-diff gate as the replay engine's)."""
    from opendataloader_pdf_spark.cdc.schema_evolution import diff_schemas

    incoming = T.StructType(
        [f for f in changes.schema.fields if f.name != "_change_type"]
    )
    sink.evolve_schema(diff_schemas(sink.current_schema(), incoming))
    # a pre-image changelog (preimages=True) carries TWO rows per update;
    # feeding both to the MERGE would write duplicate physical rows for
    # the key (the full-outer join assumes one change row per key) —
    # drop the pre-images, they exist for aggregate maintenance only
    changes = changes.filter(F.col("_change_type") != "update_preimage")
    ch = changes.withColumn(
        "op",
        F.when(F.col("_change_type") == DELETE, F.lit("delete"))
        .otherwise(F.lit("update")),
    ).drop("_change_type")
    bid = sink.last_batch_id() + 1 if batch_id is None else batch_id
    return sink.merge(sink._bucketed(ch), batch_id=bid)
