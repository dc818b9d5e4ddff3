"""Multi-table transactions: all-or-nothing publish across a data table
and a derived index, journal roll-forward after a crash between the two
publishes, refusal semantics, and idempotent recovery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    abort_all,
    begin_staged,
    commit_all,
    recover,
)
from opendataloader_pdf_spark.cdc.txn import _txn_path, in_flight
from opendataloader_pdf_spark.cdc.wap import _stage_path, publish
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.functions import tokens as TK


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("txn")
    gen_change_events(spark, 5_000, 400, seed=37).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def _mk(spark, tmp_path, name):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=8)
    ReplayEngine(spark, sink).bootstrap(None)
    return sink


def _stage_pair(spark, events, tmp_path):
    """Stage the data table (engine replay) and its fingerprint index
    (derived from the staged data) — the two tables a consistent reader
    joins."""
    data = _mk(spark, tmp_path, "data")
    idx = _mk(spark, tmp_path, "idx")
    sdata = begin_staged(data)
    ReplayEngine(spark, sdata).replay(events, batch_size=2_500)
    sidx = begin_staged(idx)
    fp = sdata.read().select(
        "doc_id",
        TK.token_fingerprint(F.col("tokens")).cast("string").alias("source"),
        "tokens", "n_tok", "lsn",
    )
    sidx.merge(fp.withColumn("op", F.lit("update")), batch_id=0)
    return data, idx


def test_commit_all_atomic_happy_path(spark, events, tmp_path):
    data, idx = _stage_pair(spark, events, tmp_path)
    assert data.read().count() == 0 and idx.read().count() == 0  # invisible
    out = commit_all([data, idx])
    assert len(out) == 2
    assert data.read().count() > 0
    assert idx.read().count() == data.read().count()  # consistent pair
    assert not in_flight(data)
    for s in (data, idx):
        assert not os.path.exists(_stage_path(s))


def test_commit_all_refuses_partial_stage(spark, events, tmp_path):
    """One participant unstaged -> nothing publishes, stages survive."""
    data = _mk(spark, tmp_path, "data2")
    idx = _mk(spark, tmp_path, "idx2")
    sdata = begin_staged(data)
    ReplayEngine(spark, sdata).replay(events, batch_size=2_500)
    with pytest.raises(ValueError, match="no staged chain"):
        commit_all([data, idx])
    assert data.read().count() == 0  # data stage NOT published
    assert os.path.exists(_stage_path(data))  # and NOT destroyed


def test_recover_rolls_forward_after_crash(spark, events, tmp_path):
    """Crash between the journal write and the second publish: recover
    must finish the txn, not rewind it."""
    data, idx = _stage_pair(spark, events, tmp_path)
    # simulate the crash: perform commit_all's steps up to publishing
    # only the FIRST participant, leaving the journal behind
    from opendataloader_pdf_spark.cdc.txn import _staged_name, _atomic_write
    import json

    journal = {"participants": [
        {"meta_dir": os.path.abspath(s.meta_dir), "staged": _staged_name(s)}
        for s in (data, idx)
    ]}
    _atomic_write(_txn_path(data), json.dumps(journal))
    publish(data)
    # crashed here: data visible, index still staged — journal present
    assert in_flight(data)
    assert data.read().count() > 0 and idx.read().count() == 0

    res = recover([data, idx])
    assert res["state"] == "committed"
    assert res["rolled_forward"] == [os.path.abspath(idx.meta_dir)]
    assert idx.read().count() == data.read().count()
    assert not in_flight(data)
    # idempotent: second recover is a no-op
    assert recover([data, idx])["state"] == "none"


def test_commit_all_requires_recovery_first(spark, events, tmp_path):
    data, idx = _stage_pair(spark, events, tmp_path)
    from opendataloader_pdf_spark.cdc.txn import _atomic_write

    _atomic_write(_txn_path(data), "{\"participants\": []}")
    with pytest.raises(ValueError, match="recover"):
        commit_all([data, idx])
    with pytest.raises(ValueError, match="cannot be aborted"):
        abort_all([data, idx])
    os.remove(_txn_path(data))
    commit_all([data, idx])
    assert idx.read().count() == data.read().count()


def test_abort_all_reclaims_both_stages(spark, events, tmp_path):
    data, idx = _stage_pair(spark, events, tmp_path)
    res = abort_all([data, idx])
    assert len(res) == 2
    assert data.read().count() == 0 and idx.read().count() == 0
    for s in (data, idx):
        assert not os.path.exists(_stage_path(s))
    # stages gone -> a fresh stage starts clean
    begin_staged(data)
