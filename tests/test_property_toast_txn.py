"""Property-based contracts for the round-4 stateful operators.

Toast: for RANDOM logs where a random subset of updates carries the
tokens=NULL unchanged-column sentinel, applying the log in RANDOM
LSN-ordered batch cuts through reduce_batch_toast → resolve_toast →
LSN-guarded merge must converge to the pandas fold "winner metadata +
latest non-null image, deletes looked through; imageless winners
diverted".

Txn boundary: for RANDOM transaction-framed logs with a RANDOM subset
of transactions never committing and an ARBITRARY (not lsn-ordered!)
row→batch assignment, the union of the buffer's releases must be
exactly the committed transactions' data rows — each exactly once —
and the held set exactly the uncommitted rows.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import ParquetMergeSink
from opendataloader_pdf_spark.cdc.toast import reduce_batch_toast, resolve_toast
from opendataloader_pdf_spark.cdc.txn_boundary import TxnBuffer

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

_TBL = T.StructType([f for f in _SCHEMA.fields if f.name != "op"])


@st.composite
def toast_logs(draw):
    n_docs = draw(st.integers(2, 6))
    n = draw(st.integers(6, 40))
    rows = []
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        op = draw(st.sampled_from(["update", "update", "update", "delete"]))
        toast = op == "update" and draw(st.booleans())
        toks = (None if op == "delete" or toast
                else draw(st.lists(st.integers(0, 99), max_size=4)))
        rows.append({
            "doc_id": f"d{doc}", "lsn": lsn, "op": op,
            "tokens": toks, "n_tok": None if toks is None else len(toks),
            "source": f"s{lsn}",
        })
    n_cuts = draw(st.integers(0, 3))
    cuts = sorted(draw(st.sets(st.integers(1, max(n - 1, 1)),
                               min_size=n_cuts, max_size=n_cuts)))
    return rows, cuts


def _toast_oracle(rows):
    """Pandas fold: per doc, winner metadata + latest non-null image;
    deletes excluded; winners with no image anywhere diverted."""
    out = {}
    df = pd.DataFrame(rows).sort_values("lsn")
    for doc, g in df.groupby("doc_id"):
        w = g.iloc[-1]
        imgs = g[g["tokens"].notna()]
        if w["op"] == "delete" or len(imgs) == 0:
            continue
        img = imgs.iloc[-1]["tokens"]
        out[doc] = (w["lsn"], tuple(img), len(img), w["source"])
    return out


_N = [0]


@pytest.fixture(scope="module")
def troot(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_toast")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=toast_logs())
def test_toast_any_ordered_cuts_converge(spark, troot, case):
    rows, cuts = case
    _N[0] += 1
    sink = ParquetMergeSink(spark, str(troot / f"t{_N[0]}"), n_buckets=4)
    sink.initialize(None, _TBL)
    bounds = [0, *cuts, len(rows)]
    bid = 0
    for lo, hi in zip(bounds, bounds[1:]):
        batch = [r for r in rows if lo <= r["lsn"] < hi]
        if not batch:
            continue
        df = spark.createDataFrame(
            [(r["doc_id"], r["lsn"], r["op"], r["tokens"], r["n_tok"],
              r["source"]) for r in batch], _SCHEMA)
        red = reduce_batch_toast(df)
        narrow = sink.read(include_deleted=True).select(
            "doc_id", "lsn", "tokens")
        completed, viol = resolve_toast(red, narrow)
        # violations are winners with no image in (batch ∪ table-so-far)
        viol.count()
        sink.merge(completed, bid)
        bid += 1
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in sink.read().collect()
    }
    want = _toast_oracle(rows)
    # a doc whose image arrives only AFTER its winner's batch cut can
    # legitimately differ from the global fold? No: images are absorbed
    # per batch and carried via the table, cuts are lsn-ordered, so the
    # final state must equal the global fold exactly.
    assert got == want


@st.composite
def framed_logs(draw):
    n_txns = draw(st.integers(2, 8))
    n = draw(st.integers(8, 50))
    rows = []
    for lsn in range(n):
        rows.append({
            "doc_id": f"d{draw(st.integers(0, 5))}", "lsn": lsn,
            "op": "update",
            "tokens": draw(st.lists(st.integers(0, 99), max_size=3)),
            "txn": draw(st.integers(0, n_txns - 1)),
        })
    committed = draw(st.sets(st.integers(0, n_txns - 1), min_size=1))
    n_batches = draw(st.integers(1, 4))
    assign = [draw(st.integers(0, n_batches - 1)) for _ in rows]
    marker_batch = {t: draw(st.integers(0, n_batches - 1))
                    for t in committed}
    return rows, committed, n_batches, assign, marker_batch


@pytest.fixture(scope="module")
def xroot(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_txn")


_M = [0]

_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("txn_id", T.LongType()),
])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=framed_logs())
def test_txn_release_is_exactly_committed_rows(spark, xroot, case):
    rows, committed, n_batches, assign, marker_batch = case
    _M[0] += 1
    buf = TxnBuffer(spark, str(xroot / f"b{_M[0]}"))
    released = []
    for b in range(n_batches):
        data = [
            (r["doc_id"], r["lsn"], r["op"], r["tokens"], r["txn"])
            for r, a in zip(rows, assign) if a == b
        ]
        markers = [
            (None, 10_000 + t, "commit", None, t)
            for t, mb in marker_batch.items() if mb == b
        ]
        batch = spark.createDataFrame(data + markers, _FRAME_SCHEMA)
        rel, st_ = buf.feed(batch, b)
        released.extend(
            (r["doc_id"], r["lsn"]) for r in rel.collect())
        buf.commit(b)
    want = sorted((r["doc_id"], r["lsn"])
                  for r in rows if r["txn"] in committed)
    assert sorted(released) == want  # exactly once, nothing uncommitted
    n_held = buf.head()[1]
    assert n_held == sum(1 for r in rows if r["txn"] not in committed)
