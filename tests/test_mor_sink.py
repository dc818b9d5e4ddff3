"""MergeOnReadSink: append-only deltas + read-time LWW resolution must be
byte-equivalent to the copy-on-write MERGE, across plain streams, patch
streams, kill/resume, and compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    MergeOnReadSink,
    ParquetMergeSink,
    ReplayEngine,
)
from opendataloader_pdf_spark.cdc.engine import JobKilled
from opendataloader_pdf_spark.datagen import gen_change_events


def _canon(df):
    pdf = df.toPandas()
    if "tokens" in pdf.columns:
        pdf["tokens"] = pdf["tokens"].map(
            lambda t: None if t is None else tuple(t)
        )
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def _audit_canon(sink):
    return (
        sink.read_audit()
        .groupBy("batch_id", "bucket")
        .agg(
            F.sum("updated").alias("u"), F.sum("inserted").alias("i"),
            F.sum("deleted").alias("d"), F.sum("stale").alias("s"),
        )
        .toPandas()
        .sort_values(["batch_id", "bucket"])
        .reset_index(drop=True)
    )


def _replay(spark, sink_cls, path, ev, batch_size=4_000, **replay_kw):
    sink = sink_cls(spark, path, n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=batch_size, **replay_kw)
    return sink


@pytest.fixture(scope="module")
def plain_events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mor_events")
    gen_change_events(spark, 16_000, 1_200, seed=21).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def test_mor_matches_cow_state_and_audit(spark, plain_events, tmp_path):
    cow = _replay(spark, ParquetMergeSink, str(tmp_path / "cow"), plain_events)
    mor = _replay(spark, MergeOnReadSink, str(tmp_path / "mor"), plain_events)
    assert _canon(cow.read()).equals(_canon(mor.read()))
    assert _canon(cow.read(include_deleted=True)).equals(
        _canon(mor.read(include_deleted=True))
    )
    assert _audit_canon(cow).equals(_audit_canon(mor))


def test_mor_compaction_is_state_invariant(spark, plain_events, tmp_path):
    mor = _replay(spark, MergeOnReadSink, str(tmp_path / "mor"), plain_events)
    before = _canon(mor.read(include_deleted=True))
    assert mor.delta_pressure()  # deltas exist pre-compaction
    done = mor.compact(buckets=list(range(8)))
    assert done
    assert not mor.delta_pressure()  # all folded
    after = _canon(mor.read(include_deleted=True))
    assert before.equals(after)
    # ingest continues cleanly on the compacted table: re-replay is a no-op
    eng = ReplayEngine(spark, mor)
    summary = eng.replay(plain_events, batch_size=4_000)
    assert sum(b["events"] for b in summary.batches) == 0


def test_mor_kill_resume_byte_identical(spark, plain_events, tmp_path):
    straight = _replay(
        spark, MergeOnReadSink, str(tmp_path / "a"), plain_events
    )
    killed = MergeOnReadSink(spark, str(tmp_path / "b"), n_buckets=8)
    eng = ReplayEngine(spark, killed)
    eng.bootstrap(None)
    with pytest.raises(JobKilled):
        eng.replay(plain_events, batch_size=4_000, fail_after=2)
    eng.replay(plain_events, batch_size=4_000)  # resume
    assert _canon(straight.read(include_deleted=True)).equals(
        _canon(killed.read(include_deleted=True))
    )


def test_mor_patch_stream_matches_cow(spark, tmp_path):
    ev = gen_change_events(spark, 4_000, 400, seed=13, patch_frac=0.3)
    ev.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    ev = spark.read.parquet(str(tmp_path / "ev"))
    cow = _replay(spark, ParquetMergeSink, str(tmp_path / "cow"), ev,
                  batch_size=1_000)
    mor = _replay(spark, MergeOnReadSink, str(tmp_path / "mor"), ev,
                  batch_size=1_000)
    assert _canon(cow.read()).equals(_canon(mor.read()))
