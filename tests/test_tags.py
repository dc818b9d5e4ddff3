"""Named refs (tags): pinned snapshots survive expiry and resolve to the
exact tagged state."""

from __future__ import annotations

import pytest

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    drop_tag,
    expire_snapshots,
    read_at,
    read_tag,
    retained_snapshots,
    tag,
    tags,
)
from opendataloader_pdf_spark.datagen import gen_change_events


def test_tag_read_and_expiry_retention(spark, tmp_path):
    ev = gen_change_events(spark, 6_000, 600, seed=37)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=8)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=1_500)

    mid_sid = sink.manifest()["commits"][1]["snapshot_id"]
    tag(sink, "train-v1", mid_sid)
    assert tags(sink) == {"train-v1": mid_sid}

    want = sorted((r["doc_id"], r["lsn"]) for r in read_at(sink, mid_sid).collect())
    got = sorted((r["doc_id"], r["lsn"]) for r in read_tag(sink, "train-v1").collect())
    assert got == want

    # expiry keeps the tagged snapshot even outside keep_last
    res = expire_snapshots(sink, keep_last=1)
    assert mid_sid not in res["expired"]
    assert mid_sid in retained_snapshots(sink)
    # the tagged state is still byte-readable after expiry
    still = sorted((r["doc_id"], r["lsn"]) for r in read_tag(sink, "train-v1").collect())
    assert still == want

    # dropping the tag releases it to the next expiry
    drop_tag(sink, "train-v1")
    res2 = expire_snapshots(sink, keep_last=1)
    assert mid_sid in res2["expired"]

    with pytest.raises(ValueError):
        read_tag(sink, "train-v1")
    with pytest.raises(ValueError):
        tag(sink, "bad name!")
