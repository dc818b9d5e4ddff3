"""Write-audit-publish: staged commits are invisible to HEAD readers,
publish is atomic, abort reclaims staged files and audit rows, and the
engine resumes a staged chain across a crash."""

from __future__ import annotations

import os

import pytest

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    begin_staged,
    abort_staged,
    publish,
    staged_commits,
)
from opendataloader_pdf_spark.cdc.engine import JobKilled
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wap")
    gen_change_events(spark, 6_000, 600, seed=29).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def _mk(spark, tmp_path, name):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=8)
    ReplayEngine(spark, sink).bootstrap(None)
    return sink


def test_stage_publish_visibility(spark, events, tmp_path):
    sink = _mk(spark, tmp_path, "t1")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000)

    # staged commits exist; HEAD readers see an empty table
    assert len(staged_commits(sink)) >= 2
    assert sink.read().count() == 0
    assert staged.read().count() > 0

    m = publish(sink)
    assert not os.path.exists(os.path.join(sink.meta_dir, "STAGE"))
    assert sink.snapshot_id() == m["snapshot_id"]
    expected = expected_final_state(events.toPandas())
    got = sink.read().toPandas()
    for c in ("lang",):
        if c not in got.columns:
            got[c] = None
    assert_states_equal(
        got[["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]], expected
    )
    # the engine's checkpoint travelled with the publish: rerun = no-op
    snap = sink.snapshot_id()
    ReplayEngine(spark, sink).replay(events, batch_size=2_000)
    assert sink.snapshot_id() == snap


def test_abort_reclaims_staged_state(spark, events, tmp_path):
    sink = _mk(spark, tmp_path, "t2")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000, max_batches=2)
    res = abort_staged(sink)
    assert res["aborted_snapshots"] and res["deleted_files"] > 0
    assert sink.read().count() == 0
    assert sink.last_batch_id() == -1
    assert sink.read_audit().count() == 0  # staged lineage dropped
    # data dir holds no orphaned staged snapshots
    from opendataloader_pdf_spark.cdc import orphan_files

    assert orphan_files(sink) == []
    # a fresh stage after abort replays from scratch and publishes clean
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000)
    publish(sink)
    assert_states_equal(
        sink.read().toPandas().assign(
            lang=lambda d: d.get("lang")
        )[["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]],
        expected_final_state(events.toPandas()),
    )


def test_staged_crash_resume(spark, events, tmp_path):
    sink = _mk(spark, tmp_path, "t3")
    staged = begin_staged(sink)
    with pytest.raises(JobKilled):
        ReplayEngine(spark, staged).replay(events, batch_size=2_000, fail_after=1)
    # begin_staged without resume refuses a dangling chain
    with pytest.raises(ValueError):
        begin_staged(sink)
    staged = begin_staged(sink, resume=True)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000)
    publish(sink)
    got = sink.read().toPandas()
    if "lang" not in got.columns:
        got["lang"] = None
    assert_states_equal(
        got[["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]],
        expected_final_state(events.toPandas()),
    )


def test_publish_rejects_moved_head(spark, events, tmp_path):
    sink = _mk(spark, tmp_path, "t4")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000, max_batches=1)
    # concurrent writer advances HEAD past the staged chain
    ReplayEngine(spark, sink).replay(events, batch_size=2_000)
    with pytest.raises(ValueError):
        publish(sink)


def test_abort_tolerates_mor_compaction_commits(spark, events, tmp_path):
    """A staged MoR chain whose compaction committed during staging must
    abort cleanly (compaction commits carry no batch_id)."""
    from opendataloader_pdf_spark.cdc import MergeOnReadSink

    sink = MergeOnReadSink(spark, str(tmp_path / "m1"), n_buckets=4,
                           compact_ratio=1.0)
    ReplayEngine(spark, sink).bootstrap(None)
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_500, max_batches=3)
    staged.compact()  # appends a batch_id-less compaction commit
    res = abort_staged(sink)
    assert res["aborted_snapshots"]
    assert sink.read().count() == 0
    assert not os.path.exists(os.path.join(sink.meta_dir, "STAGE"))
    # no husk survives the abort: staged sids are > head, so their
    # snap-/delta- dirs are purely staged state and must be gone
    # entirely (bucket dirs deleted, write markers swept, empty dir
    # removed)
    for s in res["aborted_snapshots"]:
        for prefix in ("snap", "delta"):
            d = os.path.join(sink.data_dir, f"{prefix}-{s}")
            assert not os.path.isdir(d), d
    # a fresh stage works after the abort
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_500, max_batches=1)
    publish(sink)
    assert sink.read().count() > 0


def test_publish_rejects_head_move_below_staged_tip(spark, events, tmp_path):
    """A concurrent HEAD commit at or BELOW the staged tip must also be
    rejected (the name-based base check, not just a snapshot-id race)."""
    sink = _mk(spark, tmp_path, "t5")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_500, max_batches=3)
    # concurrent writer lands ONE batch on HEAD: its snapshot id is below
    # the staged tip, so an id comparison alone would publish silently
    ReplayEngine(spark, sink).replay(events, batch_size=1_500, max_batches=1)
    with pytest.raises(ValueError, match="concurrent writer"):
        publish(sink)
