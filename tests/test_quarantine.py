"""Dead-letter quarantine: a corrupted stream replayed with
quarantine=True must land the same final table as the clean stream
alone, with every malformed row preserved in the quarantine table and
counted in the summary."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.datagen import gen_change_events

N_EVENTS, N_DOCS, BATCH = 4000, 400, 1000


def _corrupt(spark, clean):
    """Append malformed rows: null key, null lsn, unknown op, null
    delivery_seq, null schema_version — each derived from a real row so
    payloads are plausible."""
    base = clean.limit(10).collect()
    cols = clean.columns
    bad_rows = []
    for i, r in enumerate(base):
        d = r.asDict()
        d["lsn"] = d["lsn"] + 10_000_000 + i  # never collides with clean
        d["delivery_seq"] = d["delivery_seq"] + 17
        if i % 5 == 0:
            d["doc_id"] = None
        elif i % 5 == 1:
            d["lsn"] = None
        elif i % 5 == 2:
            d["op"] = "upsert??"
        elif i % 5 == 3:
            d["delivery_seq"] = None
        else:
            # a malformed row must not drive schema evolution either
            d["schema_version"] = None
        bad_rows.append(tuple(d[c] for c in cols))
    # a nullable twin of the event schema: malformed rows come from
    # untrusted sources whose schema makes no non-null promises
    from pyspark.sql import types as T

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in clean.schema.fields]
    )
    bad = spark.createDataFrame(bad_rows, nullable)
    return clean.unionByName(bad), 10


def _final_state(spark, events, tmp, name, **engine_kw):
    sink = ParquetMergeSink(spark, os.path.join(tmp, name), n_buckets=8)
    sink.drop()
    eng = ReplayEngine(spark, sink, **engine_kw)
    eng.bootstrap(None)
    summary = eng.replay(events, batch_size=BATCH)
    rows = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"] or []))
        for r in sink.read().collect()
    }
    return rows, summary, sink


@pytest.fixture(scope="module")
def clean(spark):
    return gen_change_events(spark, N_EVENTS, N_DOCS, seed=7).cache()


def test_quarantine_matches_clean_replay(spark, clean, tmp_path):
    dirty, n_bad = _corrupt(spark, clean)
    want, _, _ = _final_state(spark, clean, str(tmp_path), "t_clean")
    got, summary, sink = _final_state(
        spark, dirty, str(tmp_path), "t_dirty", quarantine=True
    )
    assert got == want
    assert summary.quarantined == n_bad
    # every malformed row is preserved byte-for-byte in the dead-letter
    # table (schema identical to the event log)
    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.count() == n_bad
    assert set(q.columns) >= set(clean.columns)
    assert q.filter(F.col("doc_id").isNull()).count() == 2
    assert q.filter(F.col("op") == "upsert??").count() == 2


def test_quarantine_off_is_unchanged(spark, clean, tmp_path):
    # default path: no quarantine dir, no summary count
    rows, summary, sink = _final_state(spark, clean, str(tmp_path), "t_off")
    assert summary.quarantined == 0
    assert not os.path.exists(os.path.join(sink.root, "_quarantine"))
    assert all(b["quarantined"] == 0 for b in summary.batches)


def test_streaming_tail_quarantine(spark, clean, tmp_path):
    from opendataloader_pdf_spark.streaming import tail_available_now

    dirty, n_bad = _corrupt(spark, clean)
    ev_dir = str(tmp_path / "events")
    dirty.repartition(6).write.mode("overwrite").parquet(ev_dir)
    sink = ParquetMergeSink(spark, str(tmp_path / "t_stream"), n_buckets=8)
    ReplayEngine(spark, sink).bootstrap(None)
    tail_available_now(spark, ev_dir, sink, str(tmp_path / "ckpt"),
                       max_files_per_trigger=2, quarantine=True)
    want, _, _ = _final_state(spark, clean, str(tmp_path), "t_stream_clean")
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"] or []))
        for r in sink.read().collect()
    }
    assert got == want
    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.count() == n_bad


def test_batch_and_stream_share_one_deadletter_table(spark, clean, tmp_path):
    # bootstrap-replay a dirty log, then tail MORE dirty files into the
    # SAME sink: the combined _quarantine dir must read back as ONE
    # partitioned table (shared `batch=` column; stream epochs prefixed)
    from opendataloader_pdf_spark.streaming import tail_available_now

    dirty, n_bad = _corrupt(spark, clean)
    sink = ParquetMergeSink(spark, str(tmp_path / "t_both"), n_buckets=8)
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    eng.replay(dirty, batch_size=BATCH)

    more = gen_change_events(spark, 2000, 200, seed=13)
    more_dirty, n_bad2 = _corrupt(spark, more)
    ev_dir = str(tmp_path / "events2")
    more_dirty.repartition(3).write.mode("overwrite").parquet(ev_dir)
    tail_available_now(spark, ev_dir, sink, str(tmp_path / "ckpt2"),
                       max_files_per_trigger=2, quarantine=True)

    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.count() == n_bad + n_bad2
    assert "batch" in q.columns


def test_quarantine_resume_idempotent(spark, clean, tmp_path):
    from opendataloader_pdf_spark.cdc.engine import JobKilled

    dirty, n_bad = _corrupt(spark, clean)
    sink = ParquetMergeSink(spark, os.path.join(str(tmp_path), "t_resume"),
                            n_buckets=8)
    sink.drop()
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    with pytest.raises(JobKilled):
        eng.replay(dirty, batch_size=BATCH, fail_after=2)
    eng2 = ReplayEngine(spark, sink, quarantine=True)
    eng2.replay(dirty, batch_size=BATCH)
    want, _, _ = _final_state(spark, clean, str(tmp_path), "t_resume_clean")
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"] or []))
        for r in sink.read().collect()
    }
    assert got == want
    # per-batch overwrite keeps the dead-letter table exactly-once too
    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.count() == n_bad


def test_invalid_row_beyond_valid_horizon_still_deadletters(spark, clean,
                                                            tmp_path):
    """Regression: an invalid row whose delivery_seq lies past the last
    VALID event's batch slot belongs to no loop iteration (the loop is
    bounded by valid events so a corrupt 10^15 seq can't inflate it) —
    it must be diverted upfront, not silently lost."""
    base = clean.limit(2).collect()
    cols = clean.columns
    bad_rows = []
    for i, r in enumerate(base):
        d = r.asDict()
        d["lsn"] = d["lsn"] + 20_000_000 + i
        d["op"] = "bogus"
        # far past every valid slot, small enough to not overflow INT bid
        d["delivery_seq"] = 10_000_000 + i
        bad_rows.append(tuple(d[c] for c in cols))
    from pyspark.sql import types as T

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in clean.schema.fields]
    )
    dirty = clean.unionByName(spark.createDataFrame(bad_rows, nullable))
    sink = ParquetMergeSink(spark, os.path.join(str(tmp_path), "t_hz"),
                            n_buckets=8)
    sink.drop()
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    summary = eng.replay(dirty, batch_size=BATCH)
    assert summary.quarantined == 2
    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.filter(F.col("op") == "bogus").count() == 2
    # final state unaffected by the stragglers
    want, _, _ = _final_state(spark, clean, str(tmp_path), "t_hz_clean")
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"] or []))
        for r in sink.read().collect()
    }
    assert got == want


def test_overflow_and_negative_seq_deadletter_not_crash(spark, clean,
                                                        tmp_path):
    """ANSI mode (Spark 4 default) would throw CAST_OVERFLOW on an INT
    batch-id cast of a 10^15 corrupt seq; and a negative seq maps to
    slot 0 under toward-zero DIV while slot 0's slice excludes it. Both
    must dead-letter, not crash or vanish."""
    base = clean.limit(2).collect()
    cols = clean.columns
    bad_rows = []
    for i, r in enumerate(base):
        d = r.asDict()
        d["lsn"] = d["lsn"] + 30_000_000 + i
        d["op"] = "bogus"
        d["delivery_seq"] = 10**15 if i == 0 else -7
        bad_rows.append(tuple(d[c] for c in cols))
    from pyspark.sql import types as T

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in clean.schema.fields]
    )
    dirty = clean.unionByName(spark.createDataFrame(bad_rows, nullable))
    sink = ParquetMergeSink(spark, os.path.join(str(tmp_path), "t_ov"),
                            n_buckets=8)
    sink.drop()
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    summary = eng.replay(dirty, batch_size=BATCH)
    assert summary.quarantined == 2
    q = spark.read.parquet(os.path.join(sink.root, "_quarantine"))
    assert q.filter(F.col("op") == "bogus").count() == 2


def test_negative_seq_is_malformed_by_contract(spark):
    from opendataloader_pdf_spark.cdc.events import invalid_event_cond

    df = spark.createDataFrame(
        [("d1", 1, "update", 1, -3), ("d2", 2, "update", 1, 0)],
        "doc_id string, lsn long, op string, schema_version int, "
        "delivery_seq long",
    )
    bad = df.filter(invalid_event_cond("doc_id", "lsn")).collect()
    assert [r["doc_id"] for r in bad] == ["d1"]
