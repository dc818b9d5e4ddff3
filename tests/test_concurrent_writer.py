"""Concurrent-writer conflicts end-to-end (VERDICT r3 task #7): beyond
the clean REJECTION the WAP/txn layers already pytest-pin, the losing
writer must be fully RECOVERABLE — abort reclaims its stage, a re-stage
from the moved HEAD replays to exactly the state a single writer would
have produced, and a multi-table commit_all that loses the race refuses
BEFORE its journal commit point so no participant is left half-published.
"""

from __future__ import annotations

import os

import pytest

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    abort_staged,
    begin_staged,
    commit_all,
    publish,
)
from opendataloader_pdf_spark.cdc.txn import in_flight, _txn_path
from opendataloader_pdf_spark.cdc.wap import _stage_base_path, _stage_path
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cw")
    gen_change_events(spark, 6_000, 600, seed=31).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def _mk(spark, tmp_path, name):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=8)
    ReplayEngine(spark, sink).bootstrap(None)
    return sink


def test_losing_writer_aborts_restages_and_converges(spark, events, tmp_path):
    """Writer A stages and partially replays; writer B lands the full
    stream on HEAD and wins. A's publish is rejected; A aborts (stage
    pointers and staged files reclaimed), re-stages from the NEW head,
    and replays the same stream — idempotent LWW application converges
    to exactly the single-writer final state, published cleanly."""
    sink = _mk(spark, tmp_path, "cw1")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=2_000, max_batches=1)
    # concurrent winner applies the whole stream directly to HEAD
    ReplayEngine(spark, sink).replay(events, batch_size=2_000)
    head_after_b = sink.snapshot_id()

    with pytest.raises(ValueError, match="concurrent writer"):
        publish(sink)
    # rejection is clean: HEAD untouched, stage still intact for abort
    assert sink.snapshot_id() == head_after_b
    assert os.path.exists(_stage_path(sink))

    winner_rows = sink.read().count()
    res = abort_staged(sink)
    # the winner re-used (and overwrote) the loser's snapshot names, so
    # every artifact the stale pointers reference is now OWNED by the
    # winning chain: a correct abort reclaims the pointers and deletes
    # NOTHING — eating the winner's files here is the failure mode
    assert res["aborted_snapshots"] == [] and res["deleted_files"] == 0
    assert not os.path.exists(_stage_path(sink))
    assert not os.path.exists(_stage_base_path(sink))
    assert sink.read().count() == winner_rows  # winner untouched

    # loser retries on the moved head: stage → replay → publish
    staged2 = begin_staged(sink)
    ReplayEngine(spark, staged2).replay(events, batch_size=2_000)
    publish(sink)

    got = sink.read().toPandas()
    expected = expected_final_state(events.toPandas())
    if "lang" not in got.columns:
        got["lang"] = None
    assert_states_equal(
        got[["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]], expected
    )


def test_abort_reclaims_only_past_winner_tip(spark, events, tmp_path):
    """Boundary of the reclaim logic: the loser staged FURTHER than the
    winner advanced HEAD, so the staged sids split into names the winner
    re-owns (≤ HEAD — must survive) and sids past the winner's tip
    (> HEAD — must be reclaimed, manifests and data files both)."""
    sink = _mk(spark, tmp_path, "cw2")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_500, max_batches=3)
    # winner lands ONE batch: re-owns sid 1, leaves staged sids 2..3 dead
    ReplayEngine(spark, sink).replay(events, batch_size=1_500, max_batches=1)

    with pytest.raises(ValueError, match="concurrent writer"):
        publish(sink)
    winner_rows = sink.read().count()
    res = abort_staged(sink)
    assert res["aborted_snapshots"] == [2, 3]
    assert sink.read().count() == winner_rows  # winner's sid-1 intact
    for s in (2, 3):
        assert not os.path.exists(
            os.path.join(sink.meta_dir, f"manifest-{s}.json")
        )
        assert not os.path.exists(os.path.join(sink.data_dir, f"snap-{s}"))


def test_commit_all_conflict_refuses_before_journal(spark, events, tmp_path):
    """A concurrent HEAD writer on ONE participant between staging and
    commit_all: the txn must refuse during validation — BEFORE the
    journal commit point — leaving every participant's HEAD untouched,
    no journal on disk, and both stages recoverable (abort + re-stage +
    commit_all then succeeds with a consistent pair)."""
    data = _mk(spark, tmp_path, "cwd")
    idx = _mk(spark, tmp_path, "cwi")
    sdata = begin_staged(data)
    sidx = begin_staged(idx)
    ReplayEngine(spark, sdata).replay(events, batch_size=2_500)
    ReplayEngine(spark, sidx).replay(events, batch_size=2_500)
    # concurrent writer moves the INDEX participant's HEAD
    ReplayEngine(spark, idx).replay(events, batch_size=2_500, max_batches=1)
    data_head, idx_head = data.snapshot_id(), idx.snapshot_id()

    with pytest.raises(ValueError, match="HEAD moved"):
        commit_all([data, idx])

    # refused pre-journal: no txn in flight, no participant published
    assert not in_flight(data)
    assert not os.path.exists(_txn_path(data))
    assert data.snapshot_id() == data_head
    assert idx.snapshot_id() == idx_head
    assert data.read().count() == 0  # data stage never leaked to readers

    # recovery: abort both stages, restage against current heads, commit
    abort_staged(data)
    abort_staged(idx)
    ReplayEngine(spark, begin_staged(data)).replay(events, batch_size=2_500)
    ReplayEngine(spark, begin_staged(idx)).replay(events, batch_size=2_500)
    out = commit_all([data, idx])
    assert len(out) == 2
    assert data.read().count() == idx.read().count() > 0
    expected = expected_final_state(events.toPandas())
    got = data.read().toPandas()
    if "lang" not in got.columns:
        got["lang"] = None
    assert_states_equal(
        got[["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]], expected
    )
