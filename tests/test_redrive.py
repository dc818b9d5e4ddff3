"""Dead-letter re-drive: repaired quarantine rows re-enter the table
exactly-once; crash anywhere roll-forwards; the vacuum retention floor
and the LSN guard both hold through the re-drive path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    redrive_quarantine,
    vacuum_tombstones,
)
from opendataloader_pdf_spark.cdc.engine import JobKilled

EVENT_COLS = ("op string, lsn long, doc_id string, tokens array<int>, "
              "n_tok int, source string, ts timestamp, "
              "delivery_seq long, schema_version int")


def _ev(spark, rows):
    full = [
        (op, lsn, d, toks, len(toks) if toks else None, "s", None, seq, 1)
        for (op, lsn, d, toks, seq) in rows
    ]
    return spark.createDataFrame(full, EVENT_COLS)


def _state(sink):
    return sorted((r["doc_id"], r["lsn"], tuple(r["tokens"]))
                  for r in sink.read().collect())


def _repair(q):
    # producer bug: op arrived as 'upsert'; null delivery_seq rows get
    # their lsn as the sequence (deterministic, monotone per key here)
    return q.withColumn(
        "op", F.when(F.col("op") == "upsert", F.lit("update"))
              .otherwise(F.col("op"))
    ).withColumn(
        "delivery_seq", F.coalesce(F.col("delivery_seq"), F.col("lsn"))
    )


def _make_quarantined(spark, tmp_path, name="t"):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=4)
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    ev = _ev(spark, [
        ("update", 10, "a", [1], 10),
        ("upsert", 20, "b", [2], 20),          # bad op → quarantined
        ("update", 30, "c", [3], 30),
        ("update", 40, "b", [9], None),        # null seq → quarantined
        ("bogus",  50, "z", [7], 50),          # unrepairable op
        ("update", 60, "a", [1, 1], 60),
    ])
    s = eng.replay(ev, batch_size=100)
    assert s.quarantined == 3
    return sink


def test_redrive_applies_repaired_rows(spark, tmp_path):
    sink = _make_quarantined(spark, tmp_path)
    assert _state(sink) == [("a", 60, (1, 1)), ("c", 30, (3,))]

    out = redrive_quarantine(spark, sink, repair=_repair)
    assert out["read"] == 3
    assert out["repaired"] == 1          # b reduced to one winner (lsn 40)
    assert out["still_bad"] == 1         # the bogus-op row
    assert out["applied"] == 1 and out["stale"] == 0
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 40, (9,)),
                            ("c", 30, (3,))]

    # residual stays quarantined under batch=-2; consumed rows archived
    root = sink.root
    res = spark.read.parquet(os.path.join(root, "_quarantine"))
    assert [r["op"] for r in res.collect()] == ["bogus"]
    arch = spark.read.parquet(
        os.path.join(root, "_quarantine_redriven",
                     f"commit={out['batch_id']}"))
    assert arch.count() == 3

    # second re-drive: only the residual, which stays bad — pure no-op
    out2 = redrive_quarantine(spark, sink, repair=_repair)
    assert out2["read"] == 1 and out2["repaired"] == 0
    assert out2["still_bad"] == 1
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 40, (9,)),
                            ("c", 30, (3,))]


def test_redrive_lsn_guard_beats_later_stream(spark, tmp_path):
    """A repaired event superseded by a later live event must lose."""
    sink = _make_quarantined(spark, tmp_path)
    # live stream moves b past the quarantined lsn 40 before the re-drive
    # delivery_seq 170 → batch 1 (batch 0 is already committed)
    ReplayEngine(spark, sink).replay(
        _ev(spark, [("update", 70, "b", [5, 5], 170)]), batch_size=100)
    out = redrive_quarantine(spark, sink, repair=_repair)
    assert out["repaired"] == 1 and out["applied"] == 0
    assert out["stale"] == 1
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 70, (5, 5)),
                            ("c", 30, (3,))]


def test_redrive_crash_before_archive_rolls_forward(spark, tmp_path):
    sink = _make_quarantined(spark, tmp_path)
    with pytest.raises(JobKilled):
        redrive_quarantine(spark, sink, repair=_repair,
                           fail_before_archive=True)
    # MERGE landed; quarantine untouched — rerun converges, no double-apply
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 40, (9,)),
                            ("c", 30, (3,))]
    out = redrive_quarantine(spark, sink, repair=_repair)
    assert out["read"] == 3
    assert out["applied"] == 0 and out["stale"] == 1  # equal-lsn → stale
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 40, (9,)),
                            ("c", 30, (3,))]
    # archive + residual landed on the rerun
    assert spark.read.parquet(
        os.path.join(sink.root, "_quarantine")).count() == 1


def test_redrive_crash_between_renames_rolls_forward(spark, tmp_path):
    """Window 2: archive done, residual swap not — next call recovers."""
    sink = _make_quarantined(spark, tmp_path)
    out = redrive_quarantine(spark, sink, repair=_repair)
    root = sink.root
    qdir = os.path.join(root, "_quarantine")
    # simulate the crash by undoing only the final rename
    os.rename(qdir, qdir + "_tmp")
    out2 = redrive_quarantine(spark, sink, repair=_repair)
    assert out2["read"] == 1 and out2["still_bad"] == 1
    assert os.path.isdir(qdir) and not os.path.isdir(qdir + "_tmp")
    assert _state(sink) == [("a", 60, (1, 1)), ("b", 40, (9,)),
                            ("c", 30, (3,))]


def test_redrive_honors_vacuum_floor(spark, tmp_path):
    """A repaired event at or below the retention floor must NOT
    resurrect a vacuumed delete — it is diverted, not applied."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    eng.replay(_ev(spark, [
        ("update", 10, "a", [1], 10),
        ("update", 20, "c", [3], 20),
        ("delete", 30, "c", None, 30),
        ("upsert", 25, "c", [8], None),   # stale-for-c, quarantined
        ("upsert", 40, "b", [2], None),   # fresh, quarantined
    ]), batch_size=100)
    vacuum_tombstones(sink, floor=30)

    out = redrive_quarantine(spark, sink, repair=_repair)
    assert out["expired"] == 1            # the lsn-25 'c' row
    assert out["repaired"] == 1           # only 'b'
    assert _state(sink) == [("a", 10, (1,)), ("b", 40, (2,))]
    exp = spark.read.parquet(
        os.path.join(sink.root, "_retention_expired_redrive"))
    assert [(r["doc_id"], r["lsn"]) for r in exp.collect()] == [("c", 25)]


def test_redrive_empty_quarantine_is_noop(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    ReplayEngine(spark, sink).bootstrap(None)
    out = redrive_quarantine(spark, sink)
    assert out["read"] == 0 and out["batch_id"] is None


def test_redrive_consumes_streaming_tail_quarantine(spark, tmp_path):
    """The streaming tail dead-letters under batch=s<epoch> (string
    partition values); the re-drive must read that layout, repair, and
    converge the shared sink — batch/streaming quarantine parity."""
    from pyspark.sql import types as T

    from opendataloader_pdf_spark.datagen import EVENT_SCHEMA
    from opendataloader_pdf_spark.streaming import tail_available_now

    relaxed = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA.fields]
    )
    rows = [
        (10, "a", "update", [1], 1, "s", None, 1, None, 10, None, None),
        (20, "b", "upsert", [2], 1, "s", None, 1, None, 20, None, None),
        (30, "a", "update", [1, 1], 2, "s", None, 1, None, 30, None, None),
        (40, "z", "bogus", [7], 1, "s", None, 1, None, 40, None, None),
    ]
    src = str(tmp_path / "log")
    spark.createDataFrame(rows, relaxed).coalesce(1).write.parquet(src)

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    ReplayEngine(spark, sink).bootstrap(None)
    tail_available_now(spark, src, sink, str(tmp_path / "ckpt"),
                       event_schema=relaxed, quarantine=True)
    assert _state(sink) == [("a", 30, (1, 1))]

    out = redrive_quarantine(spark, sink, repair=_repair)
    assert out["read"] == 2 and out["repaired"] == 1
    assert out["still_bad"] == 1
    assert _state(sink) == [("a", 30, (1, 1)), ("b", 20, (2,))]
