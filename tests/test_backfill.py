"""DBLog-style chunked concurrent backfill (cdc/backfill.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.backfill import (
    as_chunk_events,
    interleave_backfill_log,
)


def _ev(spark, rows):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("schema_version", T.IntegerType()),
        T.StructField("delivery_seq", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_interleaved_backfill_end_state(spark, tmp_path):
    # upstream history: a,b,c existed before the tail subscribed at s0=10
    #   a: updated at 3, then again at 14 (stream delivers 14)
    #   b: updated at 5, deleted at 6 (never seen by the stream)
    #   c: updated at 8 only (backfill-only, live)
    # stream-era doc d born at 17
    stream = _ev(spark, [
        ("a", 14, "update", [14], 1, "s", 1, 14),
        ("d", 17, "update", [17], 1, "s", 1, 17),
    ])
    # chunk read at position 12 covers keys {a,b,c}: upstream state at 12
    chunk = spark.createDataFrame(
        [("a", [3], 1, "s", 1), ("c", [8], 1, "s", 1)],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("schema_version", T.IntegerType()),
        ]),
    )
    log = interleave_backfill_log(stream, [(chunk, 12)])
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(log, batch_size=8)
    got = {r["doc_id"]: r for r in sink.read().collect()}
    assert set(got) == {"a", "c", "d"}
    assert got["a"]["tokens"] == [14]      # fresher stream event wins
    assert got["a"]["lsn"] == 14
    assert got["c"]["tokens"] == [8]       # backfill-only doc landed
    assert got["c"]["lsn"] == 12           # at the chunk's read position
    assert got["d"]["tokens"] == [17]      # stream-era doc untouched
    # b was deleted upstream before the chunk read: never materializes
    assert "b" not in got


def test_chunk_event_projection_is_narrow(spark):
    chunk = spark.createDataFrame(
        [("a", [1], 1)],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
        ]),
    )
    ev = as_chunk_events(chunk, chunk_lsn=5, delivery_seq=5)
    assert ev.columns == ["doc_id", "lsn", "op", "tokens", "n_tok",
                          "delivery_seq", "schema_version", "ts"]
    row = ev.collect()[0]
    assert row["op"] == "insert" and row["lsn"] == 5
    # the event-contract stamp keeps chunks valid under quarantine mode
    assert row["schema_version"] == 1 and row["ts"] is not None
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rerun_after_chunk_is_idempotent(spark, tmp_path):
    stream = _ev(spark, [("a", 14, "update", [14], 1, "s", 1, 14)])
    chunk = spark.createDataFrame(
        [("c", [8], 1, "s", 1)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "schema_version int",
    )
    log = interleave_backfill_log(stream, [(chunk, 12)])
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    s1 = eng.replay(log, batch_size=8)
    s2 = eng.replay(log, batch_size=8)   # full rerun: all batches no-op
    assert s2.applied == 0
    assert sink.read().count() == 2
    assert s1.applied > 0
