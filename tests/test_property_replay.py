"""Property-based engine contract: for RANDOM event logs (random ops,
duplicate retransmissions, bounded out-of-order delivery, mixed schema
versions, random token arrays incl. empty/null) and RANDOM batch sizes,
the replayed table equals the independent pandas oracle — token-array
equality per row. Complements the fixed-seed datagen tests with
adversarial small cases (delete-before-insert, delete of absent key,
whole-log duplicates, single-batch vs many-batch splits)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)


@st.composite
def event_logs(draw):
    n_docs = draw(st.integers(2, 10))
    n = draw(st.integers(8, 80))
    rows = []
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        op = draw(st.sampled_from(["update", "update", "update", "delete"]))
        ver = draw(st.sampled_from([1, 1, 2]))
        toks = (
            None
            if op == "delete"
            else draw(st.lists(st.integers(0, 999), max_size=6))
        )
        rows.append(
            {
                "lsn": lsn,
                "doc_id": f"d{doc}",
                "op": op,
                "tokens": toks,
                "n_tok": None if toks is None else len(toks),
                "source": draw(st.sampled_from(["web", "code"])),
                "lang": ("en" if ver == 2 else None),
                "schema_version": ver,
                # bounded out-of-order delivery: |delivery_seq - lsn| < 32
                "delivery_seq": lsn + draw(st.integers(0, 31)),
            }
        )
    # exact retransmissions (same (doc_id, lsn), same payload, later
    # delivery) — the F2 dedup target
    n_dup = draw(st.integers(0, min(4, n)))
    for i in range(n_dup):
        d = dict(rows[draw(st.integers(0, n - 1))])
        d["delivery_seq"] = d["delivery_seq"] + 64
        rows.append(d)
    batch_size = draw(st.sampled_from([7, 16, 64, 1024]))
    return rows, batch_size


_COUNTER = [0]


@pytest.fixture(scope="module")
def mkdir(tmp_path_factory):
    return tmp_path_factory.mktemp("prop")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=event_logs())
def test_random_log_matches_pandas_oracle(spark, mkdir, case):
    rows, batch_size = case
    _COUNTER[0] += 1
    pdf = pd.DataFrame(rows)
    ev = spark.createDataFrame(
        pdf,
        schema=(
            "lsn long, doc_id string, op string, tokens array<int>, "
            "n_tok int, source string, lang string, schema_version int, "
            "delivery_seq long"
        ),
    )
    sink = ParquetMergeSink(
        spark, str(mkdir / f"t{_COUNTER[0]}"), n_buckets=4
    )
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=batch_size)

    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    got = sink.read().toPandas()
    for c in cols:
        if c not in got.columns:
            got[c] = None
    expected = expected_final_state(pdf)
    assert_states_equal(got[cols], expected)

    # idempotent rerun
    snap = sink.snapshot_id()
    eng.replay(ev, batch_size=batch_size)
    assert sink.snapshot_id() == snap
