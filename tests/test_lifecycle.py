"""Whole-lifecycle integration: one sink driven through bootstrap →
in-stream-DDL replay → tombstone vacuum → staged (WAP) replay with a
crash + abort → resumed staged replay → publish → changelog replication
to a downstream replica. Every stage must compose: the final table, its
schema, and the replica all agree with a pandas-computed LWW oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    abort_staged,
    apply_changes,
    begin_staged,
    changes_between,
    publish,
    replay_ddl_stream,
    vacuum_tombstones,
)
from opendataloader_pdf_spark.cdc.engine import JobKilled

EVENT_COLS = ("op string, lsn long, doc_id string, tokens array<int>, "
              "n_tok int, source string, lang string, ts timestamp, "
              "delivery_seq long, ddl string")


def _ev(spark, rows):
    full = [
        (op, lsn, d, toks, len(toks) if toks else None, "s", lang, None,
         seq, ddl)
        for (op, lsn, d, toks, lang, seq, ddl) in rows
    ]
    return spark.createDataFrame(full, EVENT_COLS)


def _state(sink):
    return sorted(
        (r["doc_id"], r["lsn"], tuple(r["tokens"]), r["lang"])
        for r in sink.read().collect()
    )


def test_full_lifecycle(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)

    # -- stage 1: in-stream DDL replay (add lang at lsn 50) ----------
    s1 = _ev(spark, [
        ("update", 10, "a", [1], None, 10, None),
        ("update", 20, "b", [2], None, 20, None),
        ("update", 30, "c", [3], None, 30, None),
        ("delete", 40, "c", None, None, 40, None),
        ("ddl", 50, None, None, None, None,
         "ALTER TABLE t ADD COLUMN lang string"),
        ("update", 60, "a", [1, 1], "en", 60, None),
    ])
    _, tl, _ = replay_ddl_stream(spark, sink, s1, batch_size=32)
    assert len(tl) == 1
    assert _state(sink) == [("a", 60, (1, 1), "en"), ("b", 20, (2,), None)]

    # -- stage 2: vacuum c's tombstone, floor at the applied watermark
    rec = vacuum_tombstones(sink, floor=60)
    assert rec["removed"] == 1

    # -- stage 3: staged replay crashes, aborts, re-runs, publishes --
    s3 = _ev(spark, [
        ("update", 100, "b", [2, 2], "de", 100, None),
        ("update", 110, "d", [4], "fr", 110, None),
        ("update", 35, "c", [9], None, 120, None),  # sub-floor — expire
    ]).drop("ddl").withColumn(
        "schema_version", F.lit(2).cast("int")  # post-DDL epoch
    )
    published_before = _state(sink)
    staged = begin_staged(sink)
    eng = ReplayEngine(spark, staged)
    # batch_size must stay 32 for the sink's lifetime: committed offsets
    # are checkpointed in batch units, so resume math assumes a stable size
    with pytest.raises(JobKilled):
        eng.replay(s3, batch_size=32, fail_after=1)
    abort_staged(sink)
    assert _state(sink) == published_before  # abort left HEAD untouched

    staged = begin_staged(sink)
    summary = ReplayEngine(spark, staged).replay(s3, batch_size=32)
    assert summary.expired == 1  # the floor survives into the staged view
    assert _state(sink) == published_before  # still invisible pre-publish
    pre_publish_sid = sink.snapshot_id()
    publish(sink)

    want = [("a", 60, (1, 1), "en"), ("b", 100, (2, 2), "de"),
            ("d", 110, (4,), "fr")]
    assert _state(sink) == want

    # -- stage 4: replicate the published delta downstream -----------
    replica = ParquetMergeSink(spark, str(tmp_path / "r"), n_buckets=4)
    replica.initialize(None, sink.current_schema())
    # bootstrap replica to the pre-publish state, then apply the span
    ch0 = changes_between(sink, 0, pre_publish_sid)
    apply_changes(ch0, replica, batch_id=0)
    ch1 = changes_between(sink, pre_publish_sid)
    apply_changes(ch1, replica, batch_id=1)
    assert _state(replica) == want

    # -- stage 5: idempotency — replaying the same span is a no-op ---
    assert apply_changes(ch1, replica, batch_id=1) is None
    assert _state(replica) == want
