"""Debezium-style envelope wire format (cdc/envelope.py): round-trip
exactness, fault-class routing into the engine's invalid predicate, op
code normalization, and snapshot→stream handoff idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc.envelope import (
    parse_envelopes,
    render_envelopes,
)
from opendataloader_pdf_spark.cdc.events import invalid_event_cond
from opendataloader_pdf_spark.datagen import gen_change_events


def _null_deleted_payload(df):
    """Parse nulls delete payloads (the wire carries only the before-key);
    apply the same normalization to the pre-wire frame for comparison."""
    d = F.col("op") == "delete"
    return (
        df.withColumn("tokens", F.when(d, F.lit(None)).otherwise(F.col("tokens")))
        .withColumn("n_tok", F.when(d, F.lit(None)).otherwise(F.col("n_tok")))
        .withColumn("source", F.when(d, F.lit(None)).otherwise(F.col("source")))
        .withColumn("lang", F.when(d, F.lit(None)).otherwise(F.col("lang")))
    )


COLS = ["lsn", "doc_id", "op", "tokens", "n_tok", "source", "lang",
        "schema_version", "delivery_seq"]


def test_envelope_round_trip_exact(spark):
    ev = gen_change_events(spark, 3000, 300, seed=7).drop(
        "patch_start", "patch_del"
    )
    back = parse_envelopes(render_envelopes(ev))
    a = _null_deleted_payload(ev).select(COLS)
    b = back.select(COLS)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # ts round-trips at second precision (wire carries ts_ms)
    ts = (
        ev.select("lsn", "ts")
        .join(back.select("lsn", F.col("ts").alias("ts2")), "lsn")
        .filter(F.col("ts") != F.col("ts2"))
        .count()
    )
    assert ts == 0


def test_delete_envelope_shape(spark):
    """Deletes serialize the key in `before` with an explicit null
    `after` (REPLICA IDENTITY contract) — asserted on the raw JSON, not
    just the round-trip."""
    ev = gen_change_events(spark, 2000, 150, seed=3).drop(
        "patch_start", "patch_del"
    )
    wire = render_envelopes(ev, keep_cols=("op",))
    dels = wire.filter(F.col("op") == "delete").select("value")
    n = dels.count()
    assert n > 0
    assert dels.filter(F.col("value").contains('"after":null')).count() == n
    assert dels.filter(F.col("value").contains('"before":{')).count() == n
    ups = wire.filter(F.col("op") != "delete").select("value")
    assert ups.filter(F.col("value").contains('"before":null')).count() == ups.count()


@pytest.mark.parametrize(
    "raw,why",
    [
        ('{"op": "u", "ts_ms', "truncated JSON"),
        ('not json at all', "garbage"),
        ('{"op":"x","ts_ms":1,"before":null,'
         '"after":{"doc_id":"d1","tokens":[1],"n_tok":1,'
         '"source":"web","lang":"en"},'
         '"source":{"lsn":5,"seq":5,"table":"t","schema_version":1}}',
         "unknown op code"),
        ('{"op":"u","ts_ms":1,"before":null,"after":null,'
         '"source":{"lsn":5,"seq":5,"table":"t","schema_version":1}}',
         "update with no after image (null key)"),
    ],
)
def test_fault_classes_hit_invalid_predicate(spark, raw, why):
    out = parse_envelopes(spark.createDataFrame([(raw,)], "value string"))
    assert out.filter(invalid_event_cond("doc_id", "lsn")).count() == 1, why


def test_snapshot_read_op_maps_to_insert(spark):
    raw = (
        '{"op":"r","ts_ms":1000,"before":null,'
        '"after":{"doc_id":"d9","tokens":[1,2],"n_tok":2,'
        '"source":"web","lang":"en"},'
        '"source":{"lsn":7,"seq":7,"table":"t","schema_version":1}}'
    )
    row = parse_envelopes(
        spark.createDataFrame([(raw,)], "value string")
    ).collect()[0]
    assert row["op"] == "insert"
    assert row["doc_id"] == "d9" and row["lsn"] == 7
    assert list(row["tokens"]) == [1, 2]


def test_snapshot_handoff_matches_cold_replay(spark, tmp_path):
    """Bootstrap from the LWW snapshot at lsn <= L, replay the FULL
    stream (overlap included): final state must equal a cold replay from
    an empty table, and the overlapped batch must apply nothing."""
    from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
    from opendataloader_pdf_spark.cdc.events import last_writer_wins

    ev = gen_change_events(spark, 4000, 250, seed=11).drop(
        "patch_start", "patch_del"
    )
    thr = 2000

    cold = ParquetMergeSink(spark, str(tmp_path / "cold"), n_buckets=4)
    ReplayEngine(spark, cold).bootstrap(None)
    ReplayEngine(spark, cold).replay(ev, batch_size=thr + 1)

    warm = ParquetMergeSink(spark, str(tmp_path / "warm"), n_buckets=4)
    # the snapshot a checkpointed consumer would hold: LWW over every
    # event DELIVERED before the cut (the stream is out-of-order within
    # a bounded window, so delivery_seq — not lsn — defines the cut)
    snap = (
        last_writer_wins(ev.filter(F.col("delivery_seq") <= thr))
        .filter(F.col("op") != "delete")
        .select("doc_id", "tokens", "n_tok", "source", "lsn")
    )
    eng = ReplayEngine(spark, warm)
    eng.bootstrap(snap)
    eng.replay(ev, batch_size=thr + 1)

    b0 = warm.read_audit().filter(F.col("batch_id") == 0).agg(
        F.sum("updated").alias("u"), F.sum("inserted").alias("i"),
        F.sum("stale").alias("s"),
    ).collect()[0]
    assert b0["s"] and not b0["u"] and not b0["i"]

    sel = ["doc_id", "lsn", "n_tok", "tokens"]
    a = cold.read().select(sel)
    b = warm.read().select(sel)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
