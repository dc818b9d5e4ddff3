"""Transaction-boundary visibility buffer (cdc/txn_boundary.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc.txn_boundary import (
    TxnBuffer,
    committed_only,
    frame_transactions,
)


def _stream(spark, n=400, txn_size=8, commit_every=5):
    """Framed stream: txn_id = lsn // txn_size; txns with
    txn_id % commit_every == 0 never commit (in-flight/aborted)."""
    ev = spark.range(0, n).select(
        F.concat(F.lit("d"), (F.col("id") % 37).cast("string")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.lit("update").alias("op"),
        F.array((F.col("id") % 7).cast("int")).alias("tokens"),
        F.floor(F.col("id") / txn_size).cast("long").alias("txn_id"),
    )
    return frame_transactions(ev, commit_every=commit_every)


def _committed_data(stream):
    data = stream.filter(F.col("op") != "commit")
    marks = stream.filter(F.col("op") == "commit").select("txn_id").distinct()
    return data.join(marks, "txn_id", "left_semi")


def test_committed_only_matches_relational_rule(spark):
    st = _stream(spark)
    got = committed_only(st)
    want = _committed_data(st)
    assert got.count() == want.count()
    assert got.join(want, ["doc_id", "lsn"], "left_anti").count() == 0
    # uncommitted txns (txn_id % 5 == 0) never appear
    assert got.filter(F.col("txn_id") % 5 == 0).count() == 0


def test_straddling_txn_held_then_released(spark, tmp_path):
    st = _stream(spark, n=400, txn_size=8)
    # cut mid-transaction: lsn 0..299 | 300..; txn 37 spans 296..303 with
    # its marker at lsn 303 -> batch 2
    b1 = st.filter(F.col("lsn") < 300)
    b2 = st.filter(F.col("lsn") >= 300)
    buf = TxnBuffer(spark, str(tmp_path / "txn"))
    r1, s1 = buf.feed(b1, 0)
    r1 = r1.cache()
    # nothing from the straddler or uncommitted txns in batch-1 release
    assert r1.filter(F.col("txn_id") == 37).count() == 0
    assert r1.filter(F.col("txn_id") % 5 == 0).count() == 0
    # every fully-framed committed txn of batch 1 released
    want1 = _committed_data(b1)
    assert r1.count() == want1.count()
    buf.commit(0)
    r2, s2 = buf.feed(b2, 1)
    r2 = r2.cache()
    buf.commit(1)
    # the straddler's batch-1 rows released in batch 2
    assert r2.filter((F.col("txn_id") == 37) & (F.col("lsn") < 300)).count() == 4
    # union of releases == all committed data events, exactly once
    both = r1.unionByName(r2)
    want = _committed_data(st)
    assert both.count() == want.count()
    assert both.join(want, ["doc_id", "lsn"], "left_anti").count() == 0
    # held = data rows of never-committed txns
    n_uncommitted = (
        st.filter((F.col("op") != "commit") & (F.col("txn_id") % 5 == 0)).count()
    )
    assert s2.held == n_uncommitted
    r1.unpersist()
    r2.unpersist()


def test_crash_refeed_releases_identical_rows(spark, tmp_path):
    st = _stream(spark, n=240, txn_size=6)
    b1 = st.filter(F.col("lsn") < 150)
    b2 = st.filter(F.col("lsn") >= 150)
    buf = TxnBuffer(spark, str(tmp_path / "txn"))
    r1, _ = buf.feed(b1, 0)
    n1 = r1.count()
    buf.commit(0)
    ra, _ = buf.feed(b2, 1)
    got_a = sorted((r["doc_id"], r["lsn"]) for r in ra.collect())
    # crash before commit: a fresh buffer re-feeds batch 1 against the
    # same HEAD and must release the identical rows
    buf2 = TxnBuffer(spark, str(tmp_path / "txn"))
    rb, _ = buf2.feed(b2, 1)
    got_b = sorted((r["doc_id"], r["lsn"]) for r in rb.collect())
    assert got_a == got_b
    buf2.commit(1)
    assert buf2.head()[0] == 1
    # commit is idempotent; skipping ahead is refused
    buf2.commit(1)
    with pytest.raises(ValueError):
        buf2.commit(3)
    assert n1 > 0


def test_marker_arriving_before_data_rows(spark, tmp_path):
    # marker in batch 1, its data rows only in batch 2 (bounded disorder)
    st = _stream(spark, n=80, txn_size=8, commit_every=10**9)
    data = st.filter(F.col("op") != "commit")
    marks = st.filter(F.col("op") == "commit")
    b1 = marks.filter(F.col("txn_id") == 2)  # marker only
    b2 = data.filter(F.col("txn_id") == 2)   # data later
    buf = TxnBuffer(spark, str(tmp_path / "txn"))
    r1, _ = buf.feed(b1, 0)
    assert r1.count() == 0
    buf.commit(0)
    r2, _ = buf.feed(b2, 1)
    assert r2.count() == 8
    buf.commit(1)


def test_retention_retires_markers_and_flags_late_rows(spark, tmp_path):
    st = _stream(spark, n=160, txn_size=8, commit_every=10**9)
    buf = TxnBuffer(spark, str(tmp_path / "txn"), retain_horizon=40)
    r1, s1 = buf.feed(st.filter(F.col("lsn") < 120), 0)
    n_r1 = r1.count()
    buf.commit(0)
    # floor after batch 0 = 119 - 40 = 79; markers of txns fully
    # below that with nothing pending are retired
    assert s1.retired > 0
    r2, s2 = buf.feed(st.filter(F.col("lsn") >= 120), 1)
    r2.count()
    buf.commit(1)
    # a data row below the floor arriving now is surfaced as late
    late_row = st.filter((F.col("lsn") == 5) & (F.col("op") != "commit"))
    r3, s3 = buf.feed(late_row, 2)
    assert r3.count() == 0
    assert s3.late == 1
    assert n_r1 > 0


def test_retention_expires_wholly_stale_pending_txns(spark, tmp_path):
    # txn 0 (lsn 0..7) never commits; with horizon 40 it falls wholly
    # below the floor after batch 0 (hi=119 -> floor 79) and must expire
    # to aborted/ instead of riding the pending set forever
    st = _stream(spark, n=160, txn_size=8, commit_every=10**9)
    buf = TxnBuffer(spark, str(tmp_path / "txn"), retain_horizon=40)
    r1, s1 = buf.feed(st.filter(F.col("lsn") < 120), 0)
    r1.count()
    buf.commit(0)
    assert s1.aborted == 8          # txn 0's eight data rows
    assert s1.held == 0             # nothing pends after expiry
    import os
    ab = spark.read.parquet(
        str(tmp_path / "txn" / "batch-0" / "aborted"))
    assert ab.count() == 8
    assert ab.select("txn_id").distinct().collect()[0][0] == 0


def test_frame_transactions_stamps_marker_delivery_seq(spark):
    ev = spark.range(0, 40).select(
        F.concat(F.lit("d"), (F.col("id") % 5).cast("string")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.lit("update").alias("op"),
        F.array((F.col("id") % 3).cast("int")).alias("tokens"),
        F.col("id").alias("delivery_seq"),
        F.floor(F.col("id") / 10).cast("long").alias("txn_id"),
    )
    framed = frame_transactions(ev)
    markers = framed.filter(F.col("op") == "commit")
    # markers are delivered at their commit position, never seq-null —
    # a null seq would fall out of every delivery-seq batch slice
    assert markers.filter(F.col("delivery_seq").isNull()).count() == 0
    row = markers.filter(F.col("txn_id") == 1).collect()[0]
    assert row["delivery_seq"] == row["lsn"] == 19
