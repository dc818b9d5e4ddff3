"""Per-partition offset checkpointing — the Kafka/binlog-shard tail.

The core engine checkpoints ONE number (the committed micro-batch id over
a globally-sequenced log). Real change streams are sharded: a binlog tail
or Kafka topic delivers P independent partitions, each ordered only
within itself, and the consumer's durable state is a map
``partition → applied-through offset``. This module is that consumer
layer, built ON TOP of :class:`~opendataloader_pdf_spark.cdc.engine.ReplayEngine`
so the merge/LWW/schema machinery is reused unchanged:

* each round takes the next ``per_round`` offsets from every partition
  (a deterministic slice given the offset map — the crux of resume),
* assigns the slice a synthetic ``delivery_seq`` interleave that lands
  it exactly in the engine's next batch slot, and replays it,
* then commits the advanced offset map under that batch id.

Crash contract — exactly-once with NO atomicity between the two writes:
the merge commit (engine/manifest) lands first, the offset file second.
A crash between them leaves the table one batch ahead of the offsets.
Because slicing is a pure function of the offset map, the resumed tail
re-derives the SAME slice for the same batch slot; the engine sees the
slot already committed and no-ops (and would stale-drop by LSN even if
re-merged), then the offset write heals. The next-batch pointer is
therefore the OFFSET side (``len(committed offset files)``), never the
manifest's batch id.

Reference parity: the reference enumerates a directory and processes
files one-by-one with per-file progress (SURVEY.md §2.1 S4); the target
generalizes that to sharded-stream offsets per the north rule's
"checkpointed offsets so a killed job resumes from the last committed
micro-batch".

Scale notes
-----------
The offset map is O(partitions) driver-side metadata (a binlog tail has
tens to thousands of shards — never data-plane scale). Slicing pushes
``offset < hi AND offset >= lo`` per partition into the scan as an
OR-of-ranges predicate over at most P disjuncts; at 10^10 events the
per-round work is one pruned scan + the engine's one-probe-one-merge
pattern. The synthetic interleave is a pure projection (no shuffle).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc.engine import ReplayEngine


class OffsetStore:
    """Committed offset maps, one JSON file per batch id (tmp+rename,
    same single-writer discipline as the manifest chain)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_offsets")
        os.makedirs(self.dir, exist_ok=True)

    def committed_rounds(self) -> int:
        return len([f for f in os.listdir(self.dir)
                    if f.startswith("batch-") and f.endswith(".json")])

    def read(self, batch_id: int) -> dict[int, int]:
        path = os.path.join(self.dir, f"batch-{batch_id}.json")
        with open(path) as f:
            return {int(k): int(v) for k, v in json.load(f).items()}

    def current(self) -> dict[int, int]:
        n = self.committed_rounds()
        return self.read(n - 1) if n else {}

    def write(self, batch_id: int, offsets: dict[int, int]) -> None:
        path = os.path.join(self.dir, f"batch-{batch_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in offsets.items()}, f)
        os.replace(tmp, path)


class OffsetCommitCrash(RuntimeError):
    """Injected crash in the window between merge commit and offset
    commit (testing the heal path)."""


class PartitionOffsetTail:
    """Tail a sharded change stream with per-partition offset resume.

    ``events`` must carry the canonical event columns plus ``partition``
    (int, in [0, n_partitions)) and ``offset`` (long, contiguous from 0
    within each partition — the shard's own sequence). ``delivery_seq``
    is synthesized per round; any incoming value is ignored.
    """

    def __init__(self, spark, sink, n_partitions: int, per_round: int,
                 **engine_kwargs):
        self.spark = spark
        self.sink = sink
        self.n_partitions = n_partitions
        self.per_round = per_round
        self.engine = ReplayEngine(spark, sink, **engine_kwargs)
        self.store = OffsetStore(sink.root)
        # one engine batch slot per round; interleave must fit in it
        self.batch_size = per_round * n_partitions

    def offsets(self) -> dict[int, int]:
        return self.store.current()

    def _slice(self, events: DataFrame, offs: dict[int, int],
               batch_id: int) -> DataFrame:
        """The round's slice: for every partition p, offsets
        [offs[p], offs[p]+per_round), with delivery_seq interleaved into
        batch slot ``batch_id``. Pure function of (events, offs).

        The filter is a LITERAL OR-of-ranges (one disjunct per
        partition), not a map-lookup comparison: literal range
        predicates push all the way into the parquet scan (row-group
        min/max pruning on ``offset``/``partition``), so a round over a
        10^10-event log reads only the row groups covering the live
        offset windows. The map lookup survives only in the
        delivery_seq projection, where no pushdown is needed."""
        import functools

        cond = functools.reduce(
            lambda a, b: a | b,
            [
                (F.col("partition") == p)
                & (F.col("offset") >= offs.get(p, 0))
                & (F.col("offset") < offs.get(p, 0) + self.per_round)
                for p in range(self.n_partitions)
            ],
        )
        lo = F.create_map(
            *[x for p in range(self.n_partitions)
              for x in (F.lit(p), F.lit(offs.get(p, 0)))]
        )[F.col("partition")]
        seq = (
            F.lit(batch_id) * self.batch_size
            + (F.col("offset") - lo) * self.n_partitions
            + F.col("partition")
        )
        return events.filter(cond).withColumn("delivery_seq", seq.cast("long"))

    def _advance_map(self, offs: dict[int, int],
                     max_seen: dict[int, int]) -> dict[int, int]:
        """Advance each partition to max-consumed-offset + 1 (NOT by row
        count: retransmitted events share an offset, so counting rows
        would overshoot and silently skip offsets)."""
        out = {p: offs.get(p, 0) for p in range(self.n_partitions)}
        for p, mx in max_seen.items():
            out[p] = mx + 1
        return out

    def advance(self, events: DataFrame, rounds: int | None = None,
                crash_after_merge: int | None = None) -> dict[int, int]:
        """Consume up to ``rounds`` rounds (all available if None).
        Resumes from the committed offset map; heals a prior crash in
        the merge→offset window. ``crash_after_merge=k`` raises
        OffsetCommitCrash after the k-th merge of THIS call commits,
        before its offsets commit (test hook)."""
        done = 0
        while rounds is None or done < rounds:
            bid = self.store.committed_rounds()
            offs = self.store.read(bid - 1) if bid else {}
            sl = self._slice(events, offs, bid)
            max_seen = {
                int(r["partition"]): int(r["mx"])
                for r in sl.groupBy("partition")
                         .agg(F.max("offset").alias("mx")).collect()
            }
            if not max_seen:
                break  # every partition drained
            # engine no-ops if this slot already committed (heal path)
            self.engine.bootstrap(None)
            self.engine.replay(sl, batch_size=self.batch_size,
                               max_batches=1, finalize=False)
            done += 1
            if crash_after_merge is not None and done >= crash_after_merge:
                raise OffsetCommitCrash(
                    f"injected crash after merge of batch {bid}, "
                    f"before its offset commit"
                )
            self.store.write(bid, self._advance_map(offs, max_seen))
        return self.store.current()


def consumer_lag(events: "DataFrame", offsets: dict[int, int],
                 partition_col: str = "partition",
                 offset_col: str = "offset",
                 order: str = "lsn") -> "DataFrame":
    """Per-partition consumer lag & freshness view — the monitoring
    face of the offset tail (north rule: per-partition lineage and
    event-count metrics).

    For each shard of the source stream: how many events exist
    (``produced``), how many the committed offset map has applied
    (``committed``), the backlog (``lag``), and the LSN watermarks on
    both sides (``applied_hi`` = freshness of the lake table for this
    shard, ``produced_hi`` = head of the shard). ``applied_events``
    recounts offsets below the committed mark from the data itself —
    equal to ``committed`` iff the shard's offset sequence is contiguous,
    so the view doubles as a gap detector (a hole upstream shows up as
    applied_events < committed without any extra audit pass).

    Scale shape: ONE map-side-combinable aggregation over a broadcast
    join of the (tiny, driver-held) offset map onto the stream — no
    window, no shuffle of the events beyond the final per-partition
    hash agg of P rows. Partitions absent from the map count as
    committed=0 (a consumer that never started).
    """
    from pyspark.sql import functions as F

    spark = events.sparkSession
    rows = [(int(p), int(o)) for p, o in offsets.items()] or [(-1, 0)]
    cmap = F.broadcast(
        spark.createDataFrame(rows, f"{partition_col} int, committed long")
    )
    j = events.join(cmap, on=partition_col, how="left").withColumn(
        "committed", F.coalesce(F.col("committed"), F.lit(0))
    )
    applied = F.col(offset_col) < F.col("committed")
    return (
        j.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("produced"),
            F.max("committed").alias("committed"),
            F.sum(applied.cast("long")).alias("applied_events"),
            F.max(F.when(applied, F.col(order))).alias("applied_hi"),
            F.max(order).alias("produced_hi"),
        )
        .withColumn("lag", F.col("produced") - F.col("committed"))
    )
