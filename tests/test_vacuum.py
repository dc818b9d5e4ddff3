"""Tombstone retention vacuum (cdc/maintenance.vacuum_tombstones) and
the engine's vacuum_floor enforcement: removal shrinks storage without
changing reads, a sub-floor stale event can never resurrect a vacuumed
key, and the MoR delta-masking hazard is refused unless compacted."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    MergeOnReadSink,
    ParquetMergeSink,
    ReplayEngine,
    vacuum_tombstones,
)

EVENT_COLS = ("doc_id string, lsn long, op string, tokens array<int>, "
              "n_tok int, source string, schema_version int, ts timestamp, "
              "delivery_seq long")


def _events(spark, specs):
    # spec: (doc, lsn, op, tokens[, delivery_seq]) — a late stale
    # retransmission has an OLD lsn but a FRESH delivery position
    rows = [
        (s[0], s[1], s[2], s[3], len(s[3]) if s[3] else None, "s", 1, None,
         s[4] if len(s) > 4 else s[1])
        for s in specs
    ]
    return spark.createDataFrame(rows, EVENT_COLS)


def _replay(spark, sink, specs, batch_size=100):
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    return eng.replay(_events(spark, specs), batch_size=batch_size)


def _tombstones(sink):
    return (
        sink.read(include_deleted=True)
        .filter(F.coalesce(F.col("_deleted"), F.lit(False)))
        .count()
    )


def test_vacuum_removes_tombstones_reads_unchanged(spark, tmp_path):
    specs = [("a", 1, "update", [1]), ("b", 2, "update", [2]),
             ("a", 3, "delete", None), ("c", 4, "update", [3]),
             ("c", 5, "delete", None), ("d", 6, "update", [4])]
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    _replay(spark, sink, specs)
    before = sorted(r["doc_id"] for r in sink.read().collect())
    assert _tombstones(sink) == 2
    rec = vacuum_tombstones(sink, floor=6)
    assert rec["removed"] == 2 and rec["buckets"]
    assert _tombstones(sink) == 0
    assert sorted(r["doc_id"] for r in sink.read().collect()) == before
    # monotonic: a lower floor is a no-op commit-free
    again = vacuum_tombstones(sink, floor=3)
    assert again.get("noop") and again["removed"] == 0


def test_floor_blocks_resurrection(spark, tmp_path):
    """Without the floor, a stale update (lsn 2) arriving after the
    tombstone (lsn 5) was vacuumed would find no row and insert —
    resurrecting the deleted doc. The engine must dead-letter it."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    _replay(spark, sink, [("a", 1, "update", [1]), ("a", 5, "delete", None),
                          ("b", 3, "update", [2])])
    vacuum_tombstones(sink, floor=5)
    late = [("a", 2, "update", [9], 150),     # sub-floor stale — expire
            ("b", 8, "update", [2, 2], 151)]  # admissible
    eng = ReplayEngine(spark, sink)
    summary = eng.replay(_events(spark, late), batch_size=100)
    assert summary.expired == 1
    exp = spark.read.parquet(os.path.join(sink.root, "_retention_expired"))
    assert [(r["doc_id"], r["lsn"]) for r in exp.collect()] == [("a", 2)]
    got = sorted((r["doc_id"], r["lsn"]) for r in sink.read().collect())
    assert got == [("b", 8)], f"resurrected: {got}"


def test_vacuum_equals_unvacuumed_twin(spark, tmp_path):
    """Final state with vacuum + sub-floor stale injections must equal
    the never-vacuumed replay of the admissible stream."""
    part_a = [(f"k{i}", i * 10, "update", [i]) for i in range(8)] + [
        ("k2", 85, "delete", None), ("k5", 86, "delete", None)]
    part_b = [("k1", 200, "update", [7, 7], 500),
              ("k9", 201, "update", [8], 501),
              ("k2", 40, "update", [99], 502),    # stale, sub-floor
              ("k5", 12, "update", [98], 503)]    # stale, sub-floor
    ref = ParquetMergeSink(spark, str(tmp_path / "ref"), n_buckets=4)
    _replay(spark, ref, part_a)
    ReplayEngine(spark, ref).replay(
        _events(spark, [e for e in part_b if e[1] > 100]), batch_size=500)

    vac = ParquetMergeSink(spark, str(tmp_path / "vac"), n_buckets=4)
    _replay(spark, vac, part_a)
    vacuum_tombstones(vac, floor=100)
    s = ReplayEngine(spark, vac).replay(_events(spark, part_b),
                                        batch_size=500)
    assert s.expired == 2
    canon = lambda sk: sorted(
        (r["doc_id"], r["lsn"], tuple(r["tokens"])) for r in sk.read().collect())
    assert canon(vac) == canon(ref)


def test_mor_delta_masking_refused_then_compacted(spark, tmp_path):
    sink = MergeOnReadSink(spark, str(tmp_path / "t"), n_buckets=2)
    _replay(spark, sink, [("a", 1, "update", [1]), ("a", 5, "delete", None),
                          ("b", 2, "update", [2])], batch_size=3)
    # delta tombstone masks the base row for 'a' — naive vacuum would
    # resurrect it
    with pytest.raises(ValueError, match="compact first"):
        vacuum_tombstones(sink, floor=5)
    rec = vacuum_tombstones(sink, floor=5, compact_first=True)
    assert rec["removed"] >= 1
    got = sorted(r["doc_id"] for r in sink.read().collect())
    assert got == ["b"]


def test_vacuum_refused_under_staged_chain(spark, tmp_path):
    from opendataloader_pdf_spark.cdc import begin_staged

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=2)
    _replay(spark, sink, [("a", 1, "update", [1]), ("a", 2, "delete", None)])
    begin_staged(sink)
    with pytest.raises(ValueError, match="staged"):
        vacuum_tombstones(sink, floor=2)


def test_streaming_tail_enforces_floor(spark, tmp_path):
    """The Structured Streaming tail must apply the same retention
    floor as the batch engine: sub-floor retransmissions dead-letter
    per epoch instead of resurrecting vacuumed keys."""
    from opendataloader_pdf_spark.datagen import EVENT_SCHEMA
    from opendataloader_pdf_spark.streaming import tail_available_now

    import datetime

    ts0 = datetime.datetime(2026, 1, 1)

    def _row(d, lsn, op, toks, seq):
        return (lsn, d, op, toks, len(toks) if toks else None, "s", None,
                1, ts0, seq, None, None)

    from opendataloader_pdf_spark.cdc.engine import default_registry

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=2)
    sink.initialize(None, default_registry()[1])
    ev_dir = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    # the tail is the sink's ONLY writer (epoch ids come from its own
    # checkpoint): feed it, vacuum between runs, feed it the
    # retransmissions
    spark.createDataFrame(
        [_row("a", 1, "update", [1], 1), _row("a", 5, "delete", None, 5),
         _row("b", 3, "update", [2], 3)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    tail_available_now(spark, ev_dir, sink, ckpt)
    vacuum_tombstones(sink, floor=5)

    spark.createDataFrame(
        [_row("a", 2, "update", [9], 150),    # sub-floor — must expire
         _row("b", 8, "update", [2, 2], 151)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    tail_available_now(spark, ev_dir, sink, ckpt)

    got = sorted((r["doc_id"], r["lsn"]) for r in sink.read().collect())
    assert got == [("b", 8)], f"resurrected via stream: {got}"
    exp = spark.read.parquet(
        os.path.join(sink.root, "_retention_expired"))
    assert [(r["doc_id"], r["lsn"]) for r in exp.collect()] == [("a", 2)]


def test_changelog_spans_vacuum_cleanly(spark, tmp_path):
    """changes_between across a vacuum commit must report NOTHING for
    the vacuum itself (tombstone removal is not a row change a replica
    should apply) and exactly the later batch's changes when the span
    extends past it."""
    from opendataloader_pdf_spark.cdc import changes_between

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    _replay(spark, sink, [("a", 1, "update", [1]), ("a", 5, "delete", None),
                          ("b", 3, "update", [2]), ("c", 4, "update", [3])])
    pre = sink.snapshot_id()
    vacuum_tombstones(sink, floor=5)
    post_vac = sink.snapshot_id()
    assert changes_between(sink, pre, post_vac).count() == 0

    ReplayEngine(spark, sink).replay(
        _events(spark, [("b", 9, "update", [7, 7], 150),
                        ("e", 10, "update", [8], 151)]), batch_size=100)
    ch = {(r["doc_id"], r["_change_type"])
          for r in changes_between(sink, pre).collect()}
    assert ch == {("b", "update"), ("e", "insert")}, ch
