"""Transaction-boundary atomic apply: hold change events until their
transaction's COMMIT marker has been observed in the stream.

A binlog/WAL frames changes in transactions (BEGIN .. COMMIT); a tailer
that applies rows the moment they arrive can publish half a transaction
— readers would see doc A's new tokens next to doc B's old ones even
though both were written atomically upstream. Debezium models this with
transaction-metadata events (data rows carry ``txn_id``; a commit event
closes the id); this module is that contract as a Spark operator.

Reference parity: the reference publishes a document's chunk set only
when the whole parse completes (core/PdfDocumentProcessor.java's
per-document run loop — partial documents never reach a writer);
generalized here to multi-row transactional visibility in the CDC
stream (SURVEY.md §2.9 exactly-once / atomic-visibility family).

Semantics
---------
* A data event is *released* (made eligible for the LSN-guarded MERGE)
  in the first micro-batch where its transaction's commit marker has
  been seen — same batch, or any later one (marker and data may be
  split across batches in either order under bounded disorder).
* Events of transactions that never commit are never released: they sit
  in the pending set until aborted/expired by the retention horizon.
* Releases are deterministic per (state, batch): re-running a batch
  after a crash re-releases the same rows, and the downstream MERGE's
  LSN guard makes the re-apply a no-op — the same idempotence story as
  the engine's pending-patch state (cdc/patches.py PendingStore).

Scale notes
-----------
* The released/held split is two equality joins on ``txn_id`` (semi +
  anti) against the committed-id set. Open transactions per horizon are
  tiny relative to events (a marker closes each), so the commit side
  broadcasts; Catalyst falls back to a shuffled hash join if it grows.
  No windows, no per-row Python.
* State is O(open transactions + unretired markers), not O(events):
  released rows leave pending the batch they release, and
  ``retain_horizon`` bounds BOTH state classes. The horizon's contract
  is stronger than plain delivery disorder: it must be at least the
  maximum TRANSACTION LSN SPAN (commit-record lsn minus the txn's first
  data-row lsn — a long-running upstream transaction commits far above
  the rows it wrote) PLUS the delivery-disorder bound. Under that
  sizing, markers retire once no in-flight data row can still reference
  them (lsn < max_seen - horizon, nothing pending), and pending
  transactions whose EVERY data row sits below the floor expire to a
  per-batch ``aborted/`` dead-letter — their marker can no longer
  arrive inside the bound — so aborted/in-flight txns cannot grow
  state forever. A transaction that exceeds the sized span is treated
  as aborted but never lost: its rows sit in ``aborted/`` and an
  operator can re-drive them (the DLQ workflow) once the late marker
  shows up. A data row arriving below the floor is surfaced in the
  ``late`` frame. Nothing is ever silently dropped. With
  ``retain_horizon=None`` (the default) nothing expires and visibility
  is exact for arbitrarily long transactions at O(all open txns) state.
* Pending/commit state is checkpointed parquet + an atomically renamed
  HEAD (rerun-safe overwrite per batch id), mirroring PendingStore.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: op code of a commit marker row in the stream
COMMIT_OP = "commit"

#: below this many committed ids the semi/anti joins broadcast the set
BROADCAST_COMMITS = 4_000_000


class TxnStats:
    __slots__ = ("released", "held", "late", "markers", "retired", "aborted")

    def __init__(self, released=0, held=0, late=0, markers=0, retired=0,
                 aborted=0):
        self.released = released
        self.held = held
        self.late = late
        self.markers = markers
        self.retired = retired
        self.aborted = aborted

    def __repr__(self):  # pragma: no cover - debug aid
        return (f"TxnStats(released={self.released}, held={self.held}, "
                f"late={self.late}, markers={self.markers}, "
                f"retired={self.retired}, aborted={self.aborted})")


def split_markers(batch: DataFrame, txn_col: str = "txn_id",
                  order: str = "lsn") -> tuple[DataFrame, DataFrame]:
    """Split a framed batch into (data_events, commit_markers).

    Markers are rows with ``op == 'commit'``; only (txn_id, lsn) of a
    marker is meaningful — the marker's lsn is the transaction's commit
    position, used for retention.
    """
    is_marker = F.col("op") == COMMIT_OP
    data = batch.filter(~is_marker)
    markers = (
        batch.filter(is_marker)
        .groupBy(txn_col)
        .agg(F.max(order).alias("commit_lsn"))
    )
    return data, markers


class TxnBuffer:
    """Checkpointed cross-batch transaction-visibility buffer.

    Layout: ``root/batch-{id}/pending/`` + ``root/batch-{id}/commits/``
    parquet, plus ``root/HEAD`` = "batch_id n_pending n_commits floor"
    committed with an atomic rename. ``feed(batch, batch_id)`` returns
    the released (commit-visible) events for that batch; state writes
    are deterministic overwrites so a crashed batch re-runs exactly.

    HEAD advances in ``commit(batch_id)``, which the caller invokes
    AFTER its downstream merge commits (the PendingStore rule): a crash
    between feed and merge re-runs feed against the old HEAD and
    re-releases the identical rows; a crash between merge and commit
    re-runs both, and the re-apply dies on the MERGE's LSN guard. feed
    stages the HEAD line into ``batch-{id}/STAGE`` so commit works from
    a fresh process after a crash.
    """

    def __init__(self, spark: SparkSession, root: str,
                 txn_col: str = "txn_id", order: str = "lsn",
                 retain_horizon: int | None = None):
        self.spark = spark
        self.root = root
        self.txn_col = txn_col
        self.order = order
        self.retain_horizon = retain_horizon

    # -- HEAD bookkeeping (PendingStore idiom) ---------------------------
    def head(self) -> tuple[int, int, int, int]:
        path = os.path.join(self.root, "HEAD")
        if os.path.exists(path):
            with open(path) as f:
                b, np_, nc, floor = f.read().split()
            return int(b), int(np_), int(nc), int(floor)
        return -1, 0, 0, -(1 << 62)

    def _stage_head(self, batch_id: int, n_pending: int, n_commits: int,
                    floor: int) -> None:
        with open(os.path.join(self.root, f"batch-{batch_id}", "STAGE"),
                  "w") as f:
            f.write(f"{batch_id} {n_pending} {n_commits} {floor}")

    def commit(self, batch_id: int) -> None:
        """Advance HEAD to a fed batch — call after the downstream merge
        commits. Idempotent; refuses to skip or rewind batches."""
        stage = os.path.join(self.root, f"batch-{batch_id}", "STAGE")
        if not os.path.exists(stage):
            raise ValueError(f"batch {batch_id} was never fed")
        cur = self.head()[0]
        if batch_id == cur:
            return
        if batch_id != cur + 1 and cur >= 0:
            raise ValueError(f"commit {batch_id} against HEAD {cur}")
        tmp = os.path.join(self.root, f".HEAD.{batch_id}")
        with open(stage) as f:
            payload = f.read()
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(self.root, "HEAD"))

    def _read_state(self) -> tuple[DataFrame | None, DataFrame | None, int]:
        b, n_pending, n_commits, floor = self.head()
        pend = comm = None
        if b >= 0 and n_pending:
            pend = self.spark.read.parquet(
                os.path.join(self.root, f"batch-{b}", "pending"))
        if b >= 0 and n_commits:
            comm = self.spark.read.parquet(
                os.path.join(self.root, f"batch-{b}", "commits"))
        return pend, comm, floor

    @staticmethod
    def _write_counted(df: DataFrame, path: str) -> int:
        import pyarrow.parquet as pq

        # repartition, not coalesce: coalesce(1) would propagate up
        # through the (shuffle-free) broadcast joins and run the whole
        # batch scan+filter in ONE task; repartition keeps the upstream
        # parallel and single-tasks only the tiny post-shuffle write
        df.repartition(1).write.mode("overwrite").parquet(path)
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path) if f.endswith(".parquet")
        )

    # -- the operator ----------------------------------------------------
    def feed(self, batch: DataFrame, batch_id: int) -> tuple[DataFrame, TxnStats]:
        """Absorb one micro-batch; return its commit-visible events.

        The returned frame is materialized (the state write runs it), so
        callers can hand it straight to the LSN-guarded MERGE. Rows that
        arrive below the retention floor (disorder-bound violations) are
        written to ``root/batch-{id}/late/`` and reported in stats.
        """
        k, o = self.txn_col, self.order
        data, markers = split_markers(batch, k, o)
        prev_pend, prev_comm, floor = self._read_state()

        # disorder-bound enforcement: a data row whose lsn sits below the
        # marker-retention floor may belong to an already-retired txn —
        # route it to the late frame instead of pending it forever.
        if floor > -(1 << 61):
            late = data.filter(F.col(o) < F.lit(floor))
            data = data.filter(F.col(o) >= F.lit(floor))
        else:
            late = None

        commits = markers if prev_comm is None else (
            prev_comm.unionByName(markers)
            .groupBy(k).agg(F.max("commit_lsn").alias("commit_lsn"))
        )
        candidates = data if prev_pend is None else prev_pend.unionByName(data)

        # every per-batch artifact is written exactly once and never
        # rewritten, so the lazily-returned `released` frame — whose
        # lineage reads the full commit set — stays stable however late
        # the caller runs it. With retention active, the trimmed set
        # (what the NEXT batch reads as batch-{id}/commits) gets its OWN
        # file; without retention ONE write serves both roles.
        bdir = os.path.join(self.root, f"batch-{batch_id}")
        retention = self.retain_horizon is not None
        full_name = "commits-full" if retention else "commits"
        n_full = self._write_counted(commits, os.path.join(bdir, full_name))
        commit_ids = self.spark.read.parquet(os.path.join(bdir, full_name))
        if n_full <= BROADCAST_COMMITS:
            commit_ids = F.broadcast(commit_ids)

        released = candidates.join(commit_ids.select(k), on=k, how="left_semi")
        pending_all = candidates.join(commit_ids.select(k), on=k,
                                      how="left_anti")

        new_floor = floor
        if retention:
            hi = batch.agg(F.max(o)).collect()[0][0]
            if hi is not None:
                new_floor = max(floor, int(hi) - self.retain_horizon)

        # pending-transaction expiry: a txn whose EVERY data row sits
        # below the floor can no longer receive its marker inside the
        # disorder bound — it is aborted. Surface its rows under
        # aborted/ (dead-letter parity with late/, never a silent drop)
        # and remove them from state, so aborted/in-flight txns cannot
        # grow the pending set forever. Txns straddling the floor stay
        # pending whole.
        n_aborted = 0
        if retention and new_floor > -(1 << 61):
            dead_ids = (
                pending_all.groupBy(k).agg(F.max(o).alias("_hi"))
                .filter(F.col("_hi") < F.lit(new_floor))
                .select(k)
            )
            n_aborted = self._write_counted(
                pending_all.join(F.broadcast(dead_ids), on=k, how="left_semi"),
                os.path.join(bdir, "aborted"),
            )
            pending_next = pending_all.join(F.broadcast(dead_ids), on=k,
                                            how="left_anti")
        else:
            pending_next = pending_all

        n_pending = self._write_counted(pending_next,
                                        os.path.join(bdir, "pending"))
        n_late = 0
        if late is not None:
            n_late = self._write_counted(late, os.path.join(bdir, "late"))

        # marker retention: retire commit ids that (a) sit below the new
        # floor and (b) have no pending row left — any data row for them
        # still in flight is beyond the disorder bound by definition.
        n_retired = 0
        n_commits = n_full
        if retention:
            if new_floor > -(1 << 61):
                pend_ids = self.spark.read.parquet(
                    os.path.join(bdir, "pending")).select(k).distinct()
                kept = commits.filter(
                    F.col("commit_lsn") >= F.lit(new_floor)
                ).unionByName(
                    commits.filter(F.col("commit_lsn") < F.lit(new_floor))
                    .join(pend_ids, on=k, how="left_semi")
                ).groupBy(k).agg(F.max("commit_lsn").alias("commit_lsn"))
            else:
                kept = commits
            n_commits = self._write_counted(kept,
                                            os.path.join(bdir, "commits"))
            n_retired = n_full - n_commits

        self._stage_head(batch_id, n_pending, n_commits, new_floor)

        stats = TxnStats(released=-1, held=n_pending, late=n_late,
                         markers=n_commits, retired=n_retired,
                         aborted=n_aborted)
        # stats.released is left -1 (not counted): counting would force
        # an extra job over the wide payload; callers that need it count
        # the returned frame themselves.
        return released, stats


def committed_only(events: DataFrame, txn_col: str = "txn_id",
                   order: str = "lsn") -> DataFrame:
    """One-shot batch form: keep only events of committed transactions.

    For bounded logs (backfill) the buffer is overkill — a single
    semi-join against the marker set gives the same visibility rule in
    one pass. Markers are dropped from the output.
    """
    data, markers = split_markers(events, txn_col, order)
    return data.join(F.broadcast(markers.select(txn_col)), on=txn_col,
                     how="left_semi")


def frame_transactions(events: DataFrame, txn_col: str = "txn_id",
                       order: str = "lsn",
                       commit_every: int | None = None) -> DataFrame:
    """Synthesize commit markers for an unframed stream (test/backfill
    helper): one ``op='commit'`` row per txn id at the txn's max lsn.
    With ``commit_every=n``, only txns where ``txn_id % n != 0`` get a
    marker (the rest model in-flight/aborted transactions)."""
    m = events.groupBy(txn_col).agg(F.max(order).alias(order))
    if commit_every:
        m = m.filter(F.col(txn_col) % commit_every != 0)
    marker_cols = [txn_col, order]
    fills = []
    for f in events.schema.fields:
        if f.name in (*marker_cols, "op"):
            continue
        if f.name == "delivery_seq":
            # markers are DELIVERED at their commit position — a null
            # seq would fall out of every delivery-seq batch slice and
            # the transaction would never release
            fills.append(F.col(order).cast(f.dataType).alias(f.name))
        else:
            fills.append(F.lit(None).cast(f.dataType).alias(f.name))
    out = m.select(
        *marker_cols,
        F.lit(COMMIT_OP).alias("op"),
        *fills,
    )
    return events.unionByName(out.select(events.columns))
