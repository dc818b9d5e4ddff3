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


def _changes(spark, rows):
    """(doc_id, lsn, op) triples → a minimal v1-schema change batch."""
    return spark.createDataFrame(
        [(d, [1, 2], 2, "s", lsn, op) for d, lsn, op in rows],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "lsn long, op string",
    )


def test_mor_lookup_prunes_deltas_by_key_range(spark, tmp_path):
    """Point reads must skip delta FILES whose manifest key range
    provably excludes every looked-up key (the Iceberg file-stats move),
    without changing the LWW resolution for the keys that remain."""
    mor = MergeOnReadSink(spark, str(tmp_path / "mor"), n_buckets=1)
    ReplayEngine(spark, mor).bootstrap(None)
    mor.merge(_changes(spark, [(f"a_{i:02d}", 10 + i, "update")
                               for i in range(8)]), batch_id=1)
    mor.merge(_changes(spark, [(f"z_{i:02d}", 20 + i, "update")
                               for i in range(8)]), batch_id=2)
    mor.merge(_changes(spark, [("a_03", 99, "update")]), batch_id=3)

    # writer recorded parquet-footer key ranges in the manifest entries
    deltas = mor.manifest()["buckets"]["0"]["deltas"]
    assert [(d["key_min"], d["key_max"]) for d in deltas] == [
        ("a_00", "a_07"), ("z_00", "z_07"), ("a_03", "a_03")
    ]
    d_a, d_z, d_up = (d["path"].split("/")[0] for d in deltas)

    # correct under pruning: the LWW winner (lsn 99 update) still wins
    got = {r["doc_id"]: r["lsn"]
           for r in mor.lookup(["a_03", "a_05"]).collect()}
    assert got == {"a_03": 99, "a_05": 15}

    # provable: the z-range delta never enters the scan's file index
    files = "\n".join(mor.lookup(["a_03"]).inputFiles())
    assert d_a in files and d_up in files
    assert d_z not in files

    # stat-less entries (older manifests) are conservatively read
    assert MergeOnReadSink._range_may_contain({"path": "p"}, ["anything"])
    # full reads are unaffected by the feature
    assert mor.read().count() == 16


def test_mor_patch_stream_matches_cow(spark, tmp_path):
    ev = gen_change_events(spark, 4_000, 400, seed=13, patch_frac=0.3)
    ev.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    ev = spark.read.parquet(str(tmp_path / "ev"))
    cow = _replay(spark, ParquetMergeSink, str(tmp_path / "cow"), ev,
                  batch_size=1_000)
    mor = _replay(spark, MergeOnReadSink, str(tmp_path / "mor"), ev,
                  batch_size=1_000)
    assert _canon(cow.read()).equals(_canon(mor.read()))
