"""Property-based composed-lifecycle contract: for RANDOM streams, the
four-mode composition the driver-gated ``cdc_full_lifecycle`` entry
runs — mid-log backfill chunk, txn-boundary buffering across a wave
cut, TOAST null-token carry-forward, quarantine + redrive of even-lsn
bogus rows — must converge to the pure visibility-rule fold computed
in pandas. Random draws reach edge shapes the fixed events fixture
cannot: empty chunks, waves with no committed transaction, bogus-free
streams, docs whose only visible events are toast sentinels."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    redrive_quarantine,
)
from opendataloader_pdf_spark.cdc.backfill import interleave_backfill_log
from opendataloader_pdf_spark.cdc.toast import (
    reduce_batch_toast,
    resolve_toast,
)
from opendataloader_pdf_spark.cdc.txn_boundary import (
    TxnBuffer,
    frame_transactions,
)

TXN_W = 8  # txn window width in lsn space
COMMIT_EVERY = 5  # txn_id % 5 == 0 never commits

_SCHEMA = ("doc_id string, lsn long, op string, tokens array<int>, "
           "n_tok int, source string, schema_version int, ts timestamp, "
           "delivery_seq long, txn_id long")


@st.composite
def lifecycle_cases(draw):
    n_docs = draw(st.integers(4, 8))
    n = draw(st.integers(48, 120))
    toastable = draw(st.integers(0, 1))  # which doc parity toasts
    rows = []
    s0, cut = n // 3, (2 * n) // 3
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        deldoc = doc % 2 != toastable
        if deldoc and lsn >= cut and draw(st.integers(0, 6)) == 0:
            op = "bogus"
        elif deldoc and draw(st.integers(0, 4)) == 0:
            op = "delete"
        else:
            op = "update"
        toast = (op == "update" and not deldoc and lsn >= cut
                 and draw(st.integers(0, 2)) == 0)
        tokens = (None if op == "delete" or toast
                  else [lsn % 11, doc])
        rows.append({"doc_id": f"d{doc}", "lsn": lsn, "op": op,
                     "tokens": tokens, "txn_id": lsn // TXN_W})
    return rows, s0, cut, n


def _fold_oracle(rows, s0, cut, c):
    """Pandas-free pure-python oracle of the composed visibility rule."""
    def committed(r):
        return r["lsn"] <= s0 or r["txn_id"] % COMMIT_EVERY != 0

    # chunk = upstream truth at c (c is txn-aligned minus one)
    chunkvis = [r for r in rows if r["lsn"] <= c and committed(r)]
    chunk_state = {}
    for r in sorted(chunkvis, key=lambda r: r["lsn"]):
        chunk_state[r["doc_id"]] = r
    chunk_ev = [
        {"doc_id": d, "lsn": c, "op": "update", "tokens": r["tokens"]}
        for d, r in chunk_state.items() if r["op"] != "delete"
    ]
    stream_ev = [
        {"doc_id": r["doc_id"], "lsn": r["lsn"],
         "op": "update" if r["op"] == "bogus" else r["op"],
         "tokens": r["tokens"]}
        for r in rows
        if r["lsn"] > s0 and r["txn_id"] % COMMIT_EVERY != 0
        and not (r["op"] == "bogus" and r["lsn"] % 2 == 1)
    ]
    vis = chunk_ev + stream_ev
    winner, img = {}, {}
    for r in sorted(vis, key=lambda r: r["lsn"]):
        winner[r["doc_id"]] = r
        if r["tokens"] is not None:
            img[r["doc_id"]] = r["tokens"]
    return {
        d: (r["lsn"], tuple(img[d]))
        for d, r in winner.items()
        if r["op"] != "delete" and d in img
    }


_N = [0]


@pytest.fixture(scope="module")
def lroot(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_lc")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=lifecycle_cases())
def test_composed_lifecycle_converges(spark, lroot, case):
    rows, s0, cut, n = case
    _N[0] += 1
    B = n + 2
    c = ((s0 + (cut - s0) // 2) // TXN_W) * TXN_W - 1
    if c <= s0:  # tiny draws can collapse the chunk window — skip-free guard
        c = ((s0 // TXN_W) + 1) * TXN_W - 1

    full = [
        (r["doc_id"], r["lsn"], r["op"], r["tokens"],
         None if r["tokens"] is None else len(r["tokens"]), "s", 1, None,
         r["lsn"], r["txn_id"])
        for r in rows
    ]
    ch = spark.createDataFrame(full, _SCHEMA)
    chunkvis = ch.filter(
        (F.col("lsn") <= s0)
        | ((F.col("lsn") <= c) & (F.col("txn_id") % COMMIT_EVERY != 0))
    ).drop("delivery_seq", "txn_id")
    from opendataloader_pdf_spark.cdc.events import last_writer_wins
    chunk_df = (last_writer_wins(chunkvis)
                .filter(F.col("op") != "delete").drop("op", "lsn"))

    stream = ch.filter(F.col("lsn") > s0)
    framed = frame_transactions(stream, commit_every=COMMIT_EVERY)
    wave1 = framed.filter(F.col("lsn") < cut)
    wave2 = framed.filter(F.col("lsn") >= cut)

    root = str(lroot / f"t{_N[0]}")
    buf = TxnBuffer(spark, root + "/buf")
    sink = ParquetMergeSink(spark, root + "/t", n_buckets=4)
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)

    r1, _ = buf.feed(wave1, 0)
    log1 = interleave_backfill_log(r1.drop("txn_id"), [(chunk_df, c)])
    eng.replay(log1, batch_size=B, finalize=False)
    buf.commit(0)

    r2, _ = buf.feed(wave2, 1)
    r2 = r2.cache()
    bogus2 = r2.filter(F.col("op") == "bogus").drop("txn_id")
    valid2 = r2.filter(F.col("op") != "bogus").drop("txn_id")
    red = reduce_batch_toast(valid2)
    narrow = sink.read(include_deleted=True).select("doc_id", "lsn", "tokens")
    completed, _viol = resolve_toast(red, narrow)
    batch2 = completed.unionByName(bogus2).withColumn(
        "delivery_seq", F.col("lsn") + F.lit(B))
    eng.replay(batch2, batch_size=B)
    buf.commit(1)
    n_bogus = bogus2.count()
    r2.unpersist()

    if n_bogus:
        out = redrive_quarantine(
            spark, sink,
            repair=lambda q: q.withColumn(
                "op",
                F.when((F.col("op") == "bogus") & (F.col("lsn") % 2 == 0),
                       F.lit("update")).otherwise(F.col("op"))))
        assert out["read"] == n_bogus

    got = {r["doc_id"]: (r["lsn"], tuple(r["tokens"]))
           for r in sink.read().collect()}
    assert got == _fold_oracle(rows, s0, cut, c)
