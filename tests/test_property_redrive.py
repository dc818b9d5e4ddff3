"""Property-based re-drive contract: for RANDOM event logs with a
RANDOM subset corrupted (bad op / null delivery_seq), quarantined
replay followed by a repair + re-drive must converge to the pandas LWW
oracle over ALL events — as if nothing had ever been malformed — and a
second re-drive must change nothing."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    redrive_quarantine,
)
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)


@st.composite
def corrupted_logs(draw):
    n_docs = draw(st.integers(2, 8))
    n = draw(st.integers(8, 60))
    rows = []
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        op = draw(st.sampled_from(["update", "update", "update", "delete"]))
        toks = (
            None
            if op == "delete"
            else draw(st.lists(st.integers(0, 999), max_size=5))
        )
        fault = draw(st.sampled_from([None, None, None, "op", "seq"]))
        rows.append(
            {
                "lsn": lsn,
                "doc_id": f"d{doc}",
                # 'upsert' is the repairable producer bug; null seq the other
                "op": ("upsert" if fault == "op" and op == "update" else op),
                "tokens": toks,
                "n_tok": None if toks is None else len(toks),
                "source": "web",
                "lang": None,
                "schema_version": 1,
                "delivery_seq": (None if fault == "seq"
                                 else lsn + draw(st.integers(0, 15))),
            }
        )
    batch_size = draw(st.sampled_from([7, 16, 1024]))
    return rows, batch_size


_COUNTER = [0]


@pytest.fixture(scope="module")
def mkdir(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_rd")


def _repair(q):
    return q.withColumn(
        "op", F.when(F.col("op") == "upsert", F.lit("update"))
              .otherwise(F.col("op"))
    ).withColumn(
        "delivery_seq", F.coalesce(F.col("delivery_seq"), F.col("lsn"))
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=corrupted_logs())
def test_redrive_converges_to_uncorrupted_oracle(spark, mkdir, case):
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
    sink = ParquetMergeSink(spark, str(mkdir / f"t{_COUNTER[0]}"), n_buckets=4)
    eng = ReplayEngine(spark, sink, quarantine=True)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=batch_size)
    out = redrive_quarantine(spark, sink, repair=_repair)
    n_bad = sum(1 for r in rows
                if r["op"] == "upsert" or r["delivery_seq"] is None)
    assert out["read"] == n_bad
    assert out["still_bad"] == 0  # every injected fault is repairable

    # oracle: the log as if the producer had never been buggy
    clean = pdf.copy()
    clean["op"] = clean["op"].replace("upsert", "update")
    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    got = sink.read().toPandas()
    for c in cols:
        if c not in got.columns:
            got[c] = None
    assert_states_equal(got[cols], expected_final_state(clean))

    # second re-drive: empty quarantine, zero effect
    snap = sink.snapshot_id()
    out2 = redrive_quarantine(spark, sink, repair=_repair)
    assert out2["read"] == 0
    assert sink.snapshot_id() == snap
