"""Partial-update (token-splice) patch ops: engine vs the independent
pandas fold oracle, including cross-batch orphan patches and resume."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.testing import assert_states_equal, expected_final_state

EV_SCHEMA = (
    "lsn long, doc_id string, op string, tokens array<int>, n_tok int, "
    "source string, lang string, schema_version int, delivery_seq long, "
    "patch_start int, patch_del int"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


def _replay(spark, ev, tmp_path, batch_size, name="t"):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=batch_size)
    return sink


def test_patch_applies_in_lsn_order(spark, tmp_path):
    rows = [
        (1, "a", "insert", [1, 2, 3, 4], 4, "s", None, 1, 0, None, None),
        # splice at 1: delete 2, insert [9] → [1, 9, 4]
        (2, "a", "patch", [9], 1, "s", None, 1, 1, 1, 2),
        # then append at end (start clamps): → [1, 9, 4, 7, 7]
        (3, "a", "patch", [7, 7], 2, "s", None, 1, 2, 99, 0),
    ]
    sink = _replay(spark, _ev(spark, rows), tmp_path, batch_size=100)
    got = sink.read().collect()
    assert len(got) == 1
    assert list(got[0]["tokens"]) == [1, 9, 4, 7, 7]
    assert got[0]["n_tok"] == 5 and got[0]["lsn"] == 3


def test_patch_cross_batch_variants(spark, tmp_path):
    rows = [
        # batch 0 (delivery 0-9)
        (1, "a", "insert", [1, 2, 3], 3, "s", None, 1, 0, None, None),
        (5, "b", "patch", [8], 1, "s", None, 1, 1, 0, 1),   # orphan: insert in batch 1
        (9, "c", "patch", [5], 1, "s", None, 1, 2, 0, 0),   # never a predecessor
        (4, "d", "insert", [4, 4], 2, "s", None, 1, 3, None, None),
        (7, "d", "delete", None, None, "s", None, 1, 4, None, None),
        (8, "d", "patch", [6], 1, "s", None, 1, 5, 0, 0),   # fresher than delete → pending
        # batch 1 (delivery 10+)
        (2, "a", "patch", [7], 1, "s", None, 1, 10, 1, 1),  # a: [1,7,3]
        (3, "b", "insert", [2, 2], 2, "s", None, 1, 11, None, None),  # b reinserts BELOW patch lsn 5
        (6, "d", "update", [5, 5], 2, "s", None, 1, 12, None, None),  # stale vs delete lsn 7
    ]
    ev = _ev(spark, rows)
    sink = _replay(spark, ev, tmp_path, batch_size=10)
    got = {r["doc_id"]: r for r in sink.read().collect()}
    # a: insert then patch(lsn2) splices [1,2,3] → [1,7,3]
    assert list(got["a"]["tokens"]) == [1, 7, 3]
    # b: pending patch(lsn5) applies onto reinsert(lsn3): [2,2] → [8,2]
    assert list(got["b"]["tokens"]) == [8, 2]
    # c: patch without predecessor never applies
    assert "c" not in got
    # d: delete(7) beats update(6); patch(8) waits for a reinsert that
    # never comes → stays deleted
    assert "d" not in got

    # the independent pandas fold agrees
    exp = expected_final_state(ev.toPandas())
    actual = sink.read().toPandas()
    assert_states_equal(actual, exp)


def test_patch_waits_for_intermediate_write(spark, tmp_path):
    """The monotone-apply race: a patch delivered before an INTERMEDIATE
    full write crosses a batch cut. Without the disorder watermark the
    patch would apply onto the older write and the intermediate one would
    then be rejected as stale; with it, the patch parks until every write
    below its lsn has provably arrived."""
    rows = [
        (1, "a", "insert", [1, 1], 2, "s", None, 1, 0, None, None),
        (13, "a", "patch", [9], 1, "s", None, 1, 1, 0, 0),   # delivered early
        (12, "a", "update", [5, 5], 2, "s", None, 1, 9, None, None),
    ]
    # batch_size=5 splits the patch (delivery 1) from the update (delivery 9)
    sink = _replay(spark, _ev(spark, rows), tmp_path, batch_size=5)
    got = sink.read().collect()
    assert len(got) == 1
    # pure fold: insert → update [5,5] → patch prepends 9 → [9,5,5]
    assert list(got[0]["tokens"]) == [9, 5, 5]
    assert got[0]["lsn"] == 13


@pytest.mark.parametrize("batch_size", [512, 700, 4096])
def test_patch_stream_matches_fold_oracle(spark, tmp_path, batch_size):
    ev = gen_change_events(spark, 4000, 400, seed=13, patch_frac=0.3)
    ev.cache()
    sink = _replay(spark, ev, tmp_path, batch_size, name=f"t{batch_size}")
    exp = expected_final_state(ev.toPandas())
    assert_states_equal(sink.read().toPandas(), exp)
    ev.unpersist()


def test_patch_stream_kill_resume(spark, tmp_path):
    from opendataloader_pdf_spark.cdc.engine import JobKilled

    ev = gen_change_events(spark, 3000, 300, seed=17, patch_frac=0.25)
    ev.cache()
    sink = ParquetMergeSink(spark, str(tmp_path / "kr"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    with pytest.raises(JobKilled):
        eng.replay(ev, batch_size=800, fail_after=2)
    eng.replay(ev, batch_size=800)  # resume
    exp = expected_final_state(ev.toPandas())
    assert_states_equal(sink.read().toPandas(), exp)
    ev.unpersist()


def test_langless_batch_patch_preserves_evolved_lang(spark, tmp_path):
    """Review follow-up: a patch from a producer whose schema predates
    the lang column must NOT wipe the stored lang — only a full write
    from such a producer legitimately replaces the row (lang=null)."""
    # batch 1: v2 writer sets lang
    b1 = _ev(spark, [
        (1, "a", "insert", [1, 2, 3], 3, "s", "en", 2, 1, None, None),
        (1, "b", "insert", [9, 9], 2, "s", "de", 2, 2, None, None),
    ])
    sink = _replay(spark, b1, tmp_path, batch_size=10, name="t_lang")
    # batch 2: v1 writer (no lang column) sends a token splice for a and
    # a full write for b
    b2 = spark.createDataFrame(
        [(5, "a", "patch", [7], 1, "s", 1, 11, 1, 1),
         (6, "b", "update", [4], 1, "s", 1, 12, None, None)],
        "lsn long, doc_id string, op string, tokens array<int>, n_tok int, "
        "source string, schema_version int, delivery_seq long, "
        "patch_start int, patch_del int",
    ).withColumn("ts", F.current_timestamp())
    eng = ReplayEngine(spark, sink)
    eng.replay(b1.drop("patch_start", "patch_del").unionByName(
        b2, allowMissingColumns=True), batch_size=10)
    got = {r["doc_id"]: r for r in sink.read().collect()}
    assert got["a"]["tokens"] == [1, 7, 3]
    assert got["a"]["lang"] == "en"        # patch preserved lang
    assert got["b"]["tokens"] == [4]
    assert got["b"]["lang"] is None        # full write replaced the row


def test_flush_finalize_crash_window_heals(spark, tmp_path, monkeypatch):
    """Review follow-up: a crash between the flush's pending-HEAD write
    and mark_finalized must not leave the sink unflagged — the rerun's
    early return re-asserts finalization, so a longer-log replay raises
    instead of silently skipping events in the consumed slot."""
    from opendataloader_pdf_spark.cdc.patches import PendingStore

    ev = _ev(spark, [
        (1, "a", "insert", [1], 1, "s", None, 1, 1, None, None),
        # orphan patch: predecessor never arrives -> parks in pending
        (9, "a", "patch", [5], 1, "s", None, 1, 9, 99, 0),
    ])
    sink = ParquetMergeSink(spark, str(tmp_path / "t_fl"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    # crash injection: mark_finalized dies on its first call
    orig = PendingStore.mark_finalized
    calls = []

    def boom(self, batch_id):
        calls.append(batch_id)
        raise RuntimeError("injected crash before finalize")

    monkeypatch.setattr(PendingStore, "mark_finalized", boom)
    with pytest.raises(RuntimeError, match="injected"):
        eng.replay(ev, batch_size=10)
    monkeypatch.setattr(PendingStore, "mark_finalized", orig)
    assert calls  # the crash fired inside the flush
    ps = eng._pending_store()
    assert ps.finalized_at() is None  # the window is open
    # rerun: flush already consumed its slot -> early return must heal
    eng2 = ReplayEngine(spark, sink)
    eng2.replay(ev, batch_size=10)
    assert eng2._pending_store().finalized_at() is not None
    # longer log now raises instead of silently skipping slot events
    longer = ev.unionByName(_ev(spark, [
        (30, "a", "update", [8], 1, "s", None, 1, 30, None, None),
    ]))
    with pytest.raises(ValueError, match="finalized"):
        ReplayEngine(spark, sink).replay(longer, batch_size=10)
