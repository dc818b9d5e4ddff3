"""Bucket-count evolution: the manifest owns n_buckets (reopening with a
wrong constructor value adopts the table's), and rescale_buckets rewrites
the table under a new count mid-stream without changing its state."""

from __future__ import annotations

import pandas as pd
import pytest

from opendataloader_pdf_spark.cdc import (
    MergeOnReadSink,
    ParquetMergeSink,
    ReplayEngine,
    changes_between,
    rescale_buckets,
)
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)

N_EVENTS = 8_000
N_DOCS = 800
BATCH = 2_000


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rescale")
    gen_change_events(spark, N_EVENTS, N_DOCS, seed=13).write.mode(
        "overwrite"
    ).parquet(str(d / "events"))
    return str(d / "events")


def _final(sink) -> pd.DataFrame:
    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    df = sink.read().toPandas()
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def test_rescale_mid_stream_preserves_state(spark, events_path, tmp_path):
    ev = spark.read.parquet(events_path)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=BATCH, max_batches=2)

    pre_state = _final(sink)
    pre_sid = sink.snapshot_id()
    rec = rescale_buckets(sink, 32)
    assert rec["rescale"] == [8, 32]
    assert sink.n_buckets == 32
    assert sink.manifest()["n_buckets"] == 32
    # rescale moved every file but no row: state identical, changelog empty
    assert_states_equal(_final(sink), pre_state)
    assert changes_between(sink, pre_sid, sink.snapshot_id()).count() == 0

    # replay continues under the new bucket count; final state exact
    eng.replay(ev, batch_size=BATCH)
    expected = expected_final_state(ev.toPandas())
    assert_states_equal(_final(sink), expected)
    # merges landed in the rescaled layout
    assert max(int(b) for b in sink.manifest()["buckets"]) >= 8


def test_reopen_adopts_manifest_bucket_count(spark, events_path, tmp_path):
    ev = spark.read.parquet(events_path)
    root = str(tmp_path / "t2")
    sink = ParquetMergeSink(spark, root, n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=BATCH, max_batches=1)

    # a second session opens the same table with the WRONG constructor
    # count — the first manifest access adopts the table's value, so the
    # resumed replay buckets/prunes identically
    sink2 = ParquetMergeSink(spark, root, n_buckets=5)
    assert sink2.last_batch_id() == 0  # manifest() ran → adoption
    assert sink2.n_buckets == 16
    eng2 = ReplayEngine(spark, sink2)
    eng2.replay(ev, batch_size=BATCH)
    assert_states_equal(_final(sink2), expected_final_state(ev.toPandas()))


def test_rescale_mor_folds_deltas(spark, events_path, tmp_path):
    ev = spark.read.parquet(events_path)
    sink = MergeOnReadSink(spark, str(tmp_path / "t3"), n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=BATCH)

    pre_state = _final(sink)
    rescale_buckets(sink, 16)
    m = sink.manifest()
    assert m["n_buckets"] == 16
    # rescale doubles as full compaction: no delta files remain
    assert all(not ent.get("deltas") for ent in m["buckets"].values())
    assert_states_equal(_final(sink), pre_state)
