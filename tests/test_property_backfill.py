"""Property-based chunked-backfill contract: for RANDOM upstream logs,
a RANDOM mid-log subscription point, and RANDOM chunk read positions,
interleaved onboarding through the REAL engine must converge to the
pure-stream LWW fold — with stored lsns lifted to the chunk position
wherever the chunk won the arbitration."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.backfill import interleave_backfill_log

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
    T.StructField("schema_version", T.IntegerType()),
    T.StructField("delivery_seq", T.LongType()),
])


@st.composite
def backfill_cases(draw):
    n_docs = draw(st.integers(3, 8))
    n = draw(st.integers(10, 50))
    rows = []
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        op = draw(st.sampled_from(["update", "update", "update", "delete"]))
        rows.append({
            "doc_id": f"d{doc}", "lsn": lsn, "op": op,
            "tokens": (None if op == "delete"
                       else draw(st.lists(st.integers(0, 99), max_size=3))),
        })
    s0 = draw(st.integers(0, n - 2))
    # (s0, n) holds only n - 1 - s0 distinct positions, so a late s0
    # cannot support 3 unique chunk positions — bound the draw by it
    n_chunks = draw(st.integers(1, min(3, n - 1 - s0)))
    # strictly increasing chunk positions in (s0, n)
    positions = sorted(draw(st.sets(st.integers(s0 + 1, n - 1),
                                    min_size=n_chunks, max_size=n_chunks)))
    batch_size = draw(st.sampled_from([4, 9, 64]))
    return rows, s0, positions, batch_size


def _fold(rows, upto=None):
    """Pure LWW fold of events with lsn <= upto (None = all): live rows."""
    out = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        if upto is not None and r["lsn"] > upto:
            break
        if r["op"] == "delete":
            out.pop(r["doc_id"], None)
        else:
            out[r["doc_id"]] = r
    return out


_N = [0]


@pytest.fixture(scope="module")
def broot(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_bf")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=backfill_cases())
def test_interleaved_backfill_converges(spark, broot, case):
    rows, s0, positions, batch_size = case
    _N[0] += 1
    n_chunks = len(positions)
    # chunk i covers docs with suffix % n_chunks == i, read at positions[i]
    chunks = []
    for i, c in enumerate(positions):
        live = _fold(rows, upto=c)
        chunk_rows = [
            (d, r["tokens"], len(r["tokens"]), "s", 1)
            for d, r in live.items() if int(d[1:]) % n_chunks == i
        ]
        chunk = spark.createDataFrame(
            chunk_rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "schema_version int",
        )
        chunks.append((chunk, c))
    stream = spark.createDataFrame(
        [(r["doc_id"], r["lsn"], r["op"], r["tokens"],
          None if r["tokens"] is None else len(r["tokens"]), "s", 1,
          r["lsn"])
         for r in rows if r["lsn"] > s0], _SCHEMA)
    log = interleave_backfill_log(stream, chunks)
    sink = ParquetMergeSink(spark, str(broot / f"t{_N[0]}"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(log, batch_size=batch_size)

    # oracle: every full-fold-live doc survives with its global winner's
    # tokens, and its stored lsn = max(winner_lsn, chunk_position) —
    # the winner (an update, global max) is either fresher than the
    # chunk (stream applies it after, lsn = winner) or absorbed by it
    # (doc live at c with winner <= c is in the chunk, lsn = c). Dead
    # docs are dead both ways: a delete above s0 tombstones via the
    # stream, and one at/below s0 means the doc is absent from its
    # chunk with nothing in the stream to revive it.
    want = {}
    for d, r in _fold(rows).items():
        cpos = positions[int(d[1:]) % n_chunks]
        want[d] = (max(r["lsn"], cpos), tuple(r["tokens"]))
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"]))
        for r in sink.read().collect()
    }
    assert got == want
