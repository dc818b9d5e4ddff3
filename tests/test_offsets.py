"""Per-partition offset checkpointing (cdc/offsets.py): deterministic
slicing, drain with uneven partitions, and exactly-once through a crash
in the merge→offset-commit window."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.events import last_writer_wins
from opendataloader_pdf_spark.cdc.offsets import (
    OffsetCommitCrash,
    PartitionOffsetTail,
)
from opendataloader_pdf_spark.datagen import gen_change_events

P = 4


def _sharded(spark, n=6000, docs=400, seed=13):
    """A sharded stream: round-robin partitions, contiguous per-partition
    offsets derived from the global lsn order."""
    ev = gen_change_events(spark, n, docs, seed=seed).drop(
        "patch_start", "patch_del"
    )
    return ev.withColumn(
        "partition", (F.col("lsn") % P).cast("int")
    ).withColumn("offset", F.expr(f"lsn div {P}"))


def test_tail_drains_to_lww_state(spark, tmp_path):
    ev = _sharded(spark)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    tail = PartitionOffsetTail(spark, sink, n_partitions=P, per_round=400)
    offs = tail.advance(ev)

    totals = {
        int(r["partition"]): int(r["mx"]) + 1
        for r in ev.groupBy("partition")
                 .agg(F.max("offset").alias("mx")).collect()
    }
    assert offs == totals

    exp = last_writer_wins(ev.drop("partition", "offset")).filter(
        F.col("op") != "delete"
    )
    sel = ["doc_id", "lsn", "n_tok", "tokens"]
    got = sink.read().select(sel)
    assert exp.select(sel).exceptAll(got).count() == 0
    assert got.exceptAll(exp.select(sel)).count() == 0


def test_tail_uneven_partitions_drain_independently(spark, tmp_path):
    """One partition much longer than the rest: short partitions run dry
    while rounds keep consuming the long one."""
    ev = _sharded(spark)
    # partition 0 keeps everything; others truncated to 100 offsets
    ev = ev.filter((F.col("partition") == 0) | (F.col("offset") < 100))
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    tail = PartitionOffsetTail(spark, sink, n_partitions=P, per_round=120)
    offs = tail.advance(ev)
    totals = {
        int(r["partition"]): int(r["mx"]) + 1
        for r in ev.groupBy("partition")
                 .agg(F.max("offset").alias("mx")).collect()
    }
    assert offs == totals
    assert offs[0] > offs[1]


def test_crash_between_merge_and_offsets_heals(spark, tmp_path):
    """Kill after the merge commits but before the offsets commit; a
    fresh consumer must re-derive the same slice, no-op the committed
    slot, and converge to the uncrashed twin byte-for-byte."""
    ev = _sharded(spark, seed=29)

    clean = ParquetMergeSink(spark, str(tmp_path / "clean"), n_buckets=4)
    PartitionOffsetTail(spark, clean, n_partitions=P,
                        per_round=400).advance(ev)

    crashy = ParquetMergeSink(spark, str(tmp_path / "crashy"), n_buckets=4)
    t1 = PartitionOffsetTail(spark, crashy, n_partitions=P, per_round=400)
    try:
        t1.advance(ev, crash_after_merge=1)
        raise AssertionError("crash did not fire")
    except OffsetCommitCrash:
        pass
    # the window is open: table one batch ahead of the offsets
    assert crashy.last_batch_id() == 0
    assert t1.store.committed_rounds() == 0

    t2 = PartitionOffsetTail(spark, crashy, n_partitions=P, per_round=400)
    offs2 = t2.advance(ev)
    assert t2.store.committed_rounds() == crashy.last_batch_id() + 1

    sel = ["doc_id", "lsn", "n_tok", "tokens"]
    a = clean.read().select(sel)
    b = crashy.read().select(sel)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # and the stream is fully consumed
    totals = {
        int(r["partition"]): int(r["mx"]) + 1
        for r in ev.groupBy("partition")
                 .agg(F.max("offset").alias("mx")).collect()
    }
    assert offs2 == totals


def test_resume_mid_stream_continues_not_restarts(spark, tmp_path):
    """advance(rounds=1) then a new consumer finishing the stream equals
    one uninterrupted drain — the offset map, not the caller, owns
    progress."""
    ev = _sharded(spark, seed=31)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    PartitionOffsetTail(spark, sink, n_partitions=P,
                        per_round=300).advance(ev, rounds=1)
    mid = PartitionOffsetTail(spark, sink, n_partitions=P,
                              per_round=300).offsets()
    assert all(v == 300 for v in mid.values())
    PartitionOffsetTail(spark, sink, n_partitions=P,
                        per_round=300).advance(ev)

    exp = last_writer_wins(ev.drop("partition", "offset")).filter(
        F.col("op") != "delete"
    )
    sel = ["doc_id", "lsn", "n_tok", "tokens"]
    got = sink.read().select(sel)
    assert exp.select(sel).exceptAll(got).count() == 0
    assert got.exceptAll(exp.select(sel)).count() == 0


def test_slice_pushes_offset_ranges_to_parquet_scan(spark, tmp_path):
    """Plan shape: the round slice over a PARQUET-backed stream must
    push the per-partition offset ranges into the scan (row-group
    min/max pruning at 10^10 events) — a map-lookup comparison would
    leave PushedFilters empty and read the whole log."""
    path = str(tmp_path / "stream")
    _sharded(spark, n=2000).write.parquet(path)
    ev = spark.read.parquet(path)

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    tail = PartitionOffsetTail(spark, sink, n_partitions=P, per_round=100)
    sl = tail._slice(ev, {0: 100, 1: 100, 2: 100, 3: 100}, batch_id=1)
    plan = sl._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "offset" in pushed[0] and "GreaterThanOrEqual" in pushed[0]
