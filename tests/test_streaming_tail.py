"""Structured Streaming tail: availableNow replay equals the pandas
oracle; a resumed query with the same checkpoint is a no-op; new files
appended after the first run are picked up incrementally."""

from __future__ import annotations

import pytest

from opendataloader_pdf_spark.cdc import ParquetMergeSink
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.streaming import tail_available_now
from opendataloader_pdf_spark.testing import assert_states_equal, expected_final_state

N_EVENTS = 6_000
N_DOCS = 600


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tail")
    ev = gen_change_events(spark, N_EVENTS, N_DOCS, seed=11)
    # many files → many micro-batches under maxFilesPerTrigger
    ev.repartition(12).write.mode("overwrite").parquet(str(d / "events"))
    return d


def _final(sink):
    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    df = sink.read().toPandas()
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def test_tail_available_now_matches_oracle_and_resumes(spark, event_dir, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "tbl"), n_buckets=8)
    from opendataloader_pdf_spark.cdc import ReplayEngine

    ReplayEngine(spark, sink).bootstrap(None)

    applied = tail_available_now(
        spark, str(event_dir / "events"), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
    )
    assert len(applied) >= 3  # several micro-batches

    ev_pdf = spark.read.parquet(str(event_dir / "events")).toPandas()
    assert_states_equal(_final(sink), expected_final_state(ev_pdf))

    # resume with same checkpoint: fully caught up → no batches applied
    applied2 = tail_available_now(
        spark, str(event_dir / "events"), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
    )
    assert applied2 == []
    assert_states_equal(_final(sink), expected_final_state(ev_pdf))


def test_tail_picks_up_appended_files(spark, event_dir, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "tbl2"), n_buckets=8)
    from opendataloader_pdf_spark.cdc import ReplayEngine

    ReplayEngine(spark, sink).bootstrap(None)
    src = str(tmp_path / "grow")
    ev = spark.read.parquet(str(event_dir / "events"))
    lo = ev.filter("lsn < 3000")
    hi = ev.filter("lsn >= 3000")
    lo.repartition(4).write.mode("overwrite").parquet(src)

    tail_available_now(spark, src, sink, str(tmp_path / "ckpt2"), max_files_per_trigger=2)
    # append the rest of the log, tail again from the same checkpoint
    hi.repartition(4).write.mode("append").parquet(src)
    applied = tail_available_now(spark, src, sink, str(tmp_path / "ckpt2"),
                                 max_files_per_trigger=2)
    assert applied  # incremental batches

    assert_states_equal(_final(sink), expected_final_state(ev.toPandas()))


def test_tail_patch_stream_matches_fold_oracle(spark, tmp_path):
    """Patch events through the streaming tail: pending state carries
    orphan patches across micro-batches; final table equals the pure
    LSN-fold oracle. Files are written in delivery order so the
    disorder watermark applies (binlog-segment analog)."""
    from pyspark.sql import functions as F

    ev = gen_change_events(spark, 4000, 400, seed=29, patch_frac=0.3)
    ev.cache()
    src = str(tmp_path / "patch_events")
    # delivery-ordered segment files: 8 contiguous delivery ranges
    n_files = 8
    hi = ev.agg(F.max("delivery_seq")).collect()[0][0] + 1
    step = (hi + n_files - 1) // n_files
    for i in range(n_files):
        (ev.filter((F.col("delivery_seq") >= i * step)
                   & (F.col("delivery_seq") < (i + 1) * step))
         .coalesce(1).write.mode("append").parquet(src))

    sink = ParquetMergeSink(spark, str(tmp_path / "ptbl"), n_buckets=8)
    from opendataloader_pdf_spark.cdc import ReplayEngine

    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    applied = tail_available_now(
        spark, src, sink, str(tmp_path / "pckpt"),
        max_files_per_trigger=2, disorder_window=64,
    )
    assert applied
    # terminal flush of watermark-parked patches (bounded log is done)
    eng.flush_pending(ev, max(applied) + 1)
    assert_states_equal(_final(sink), expected_final_state(ev.toPandas()))
    ev.unpersist()


def test_tail_after_batch_replay_loses_nothing(spark, tmp_path):
    """Review follow-up: streaming epochs restart at 0 per checkpoint,
    but the manifest batch_id namespace is shared with the batch
    engine. Tailing a batch-written sink with a FRESH checkpoint must
    not no-op the first N epochs — the SLOT_BASE mapping pins each
    epoch to a fresh manifest slot."""
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.cdc import ReplayEngine

    ev = gen_change_events(spark, 4_000, 400, seed=23)
    first = ev.filter(F.col("delivery_seq") < 2_000)
    rest = ev.filter(F.col("delivery_seq") >= 2_000)

    sink = ParquetMergeSink(spark, str(tmp_path / "tbl"), n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    # batch engine consumes slots 0..3 on the bounded prefix
    eng.replay(first, batch_size=500)
    assert sink.last_batch_id() >= 3

    # the live tail takes over with a fresh checkpoint on the remainder
    rest.repartition(6).write.mode("overwrite").parquet(
        str(tmp_path / "more"))
    applied = tail_available_now(
        spark, str(tmp_path / "more"), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    assert len(applied) >= 2           # several epochs actually APPLIED
    assert min(applied) > 3            # in fresh slots, none swallowed

    ev_pdf = ev.toPandas()
    assert_states_equal(_final(sink), expected_final_state(ev_pdf))
