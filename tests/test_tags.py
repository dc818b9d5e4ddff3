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


def test_tag_tmp_leftover_is_ignored(spark, tmp_path):
    """A crash between _atomic_write's tmp-create and rename must not
    break tags()/expire (phantom or unparseable refs)."""
    ev = gen_change_events(spark, 2_000, 200, seed=38)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=1_000)
    tag(sink, "good")
    # simulate the crash leftover
    import os

    with open(os.path.join(sink.meta_dir, "ref-bad.tmp.deadbeef"), "w") as f:
        f.write("")
    assert tags(sink) == {"good": sink.snapshot_id()}
    expire_snapshots(sink, keep_last=1)  # must not raise


def test_expire_ignores_dangling_staged_chain(spark, tmp_path):
    """Manifests past HEAD (a crashed WAP stage) neither count toward
    keep_last nor get expired — wap.abort owns them."""
    from opendataloader_pdf_spark.cdc import begin_staged

    ev = gen_change_events(spark, 4_000, 400, seed=39)
    sink = ParquetMergeSink(spark, str(tmp_path / "t2"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=1_000, max_batches=2)
    head = sink.snapshot_id()

    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(ev, batch_size=1_000)  # dangles

    res = expire_snapshots(sink, keep_last=2)
    # staged manifests (> head) survive untouched; expiry counted only
    # published history
    assert all(s <= head for s in res["expired"])
    assert max(retained_snapshots(sink)) > head
    kept_published = [s for s in retained_snapshots(sink) if s <= head]
    assert len(kept_published) >= 2
