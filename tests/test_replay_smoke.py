"""Phase-1 vertical slice (SURVEY.md §7.4): synthetic CDC stream →
replay → final table equals independent pandas reducer, token-array
equality per row; re-run is a no-op; kill/resume is exact."""

from __future__ import annotations

import pandas as pd
import pytest

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.engine import JobKilled
from opendataloader_pdf_spark.datagen import gen_change_events, gen_documents
from opendataloader_pdf_spark.testing import assert_states_equal, expected_final_state

N_EVENTS = 10_000
N_DOCS = 1_000
BATCH = 2_000


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    gen_change_events(spark, N_EVENTS, N_DOCS, seed=42).write.mode("overwrite").parquet(
        str(d / "events")
    )
    gen_documents(spark, N_DOCS // 2, seed=42).write.mode("overwrite").parquet(
        str(d / "base")
    )
    return d


def _expected(spark, stream):
    ev = spark.read.parquet(str(stream / "events")).toPandas()
    base = spark.read.parquet(str(stream / "base")).toPandas()
    return expected_final_state(ev, base)


def _final(sink: ParquetMergeSink) -> pd.DataFrame:
    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    df = sink.read().toPandas()
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def test_full_replay_matches_pandas_oracle(spark, stream, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "tbl"), n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(spark.read.parquet(str(stream / "base")))
    ev = spark.read.parquet(str(stream / "events"))

    summary = eng.replay(ev, batch_size=BATCH)
    assert summary.events >= N_EVENTS  # includes duplicate retransmissions

    expected = _expected(spark, stream)
    assert_states_equal(_final(sink), expected)

    # schema evolved additively: lang present, non-null for v2 winners
    assert "lang" in [f.name for f in sink.current_schema().fields]

    # rerun is a no-op (idempotent / exactly-once)
    snap_before = sink.snapshot_id()
    summary2 = eng.replay(ev, batch_size=BATCH)
    assert summary2.events == 0 and sink.snapshot_id() == snap_before
    assert_states_equal(_final(sink), expected)


def test_kill_and_resume_byte_identical(spark, stream, tmp_path):
    ev = spark.read.parquet(str(stream / "events"))
    base = spark.read.parquet(str(stream / "base"))

    sink = ParquetMergeSink(spark, str(tmp_path / "tbl2"), n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(base)
    with pytest.raises(JobKilled):
        eng.replay(ev, batch_size=BATCH, fail_after=2)
    committed = sink.last_batch_id()
    assert committed >= 1

    # resume from checkpoint — picks up at committed+1 and finishes
    summary = eng.replay(ev, batch_size=BATCH)
    assert summary.batches[0]["batch_id"] == committed + 1
    assert_states_equal(_final(sink), _expected(spark, stream))


def test_audit_lineage_covers_all_batches(spark, stream, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "tbl3"), n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    ev = spark.read.parquet(str(stream / "events"))
    summary = eng.replay(ev, batch_size=BATCH)

    audit = sink.read_audit().toPandas()
    assert set(audit["batch_id"]) == {b["batch_id"] for b in summary.batches}
    # lineage LSN ranges are sane and disjoint-ish per batch
    g = audit.groupby("batch_id").agg(lo=("min_lsn", "min"), hi=("max_lsn", "max"))
    assert (g["lo"] <= g["hi"]).all()


def test_salted_reduction_identical(spark, stream, tmp_path):
    ev = spark.read.parquet(str(stream / "events"))
    base = spark.read.parquet(str(stream / "base"))
    sink = ParquetMergeSink(spark, str(tmp_path / "tbl4"), n_buckets=16)
    eng = ReplayEngine(spark, sink, salted=True)
    eng.bootstrap(base)
    eng.replay(ev, batch_size=BATCH)
    assert_states_equal(_final(sink), _expected(spark, stream))
