"""Range-bucketed SCD2 == plain SCD2 for RANDOM streams and awkward
bucket widths: the boundary-stitch join must close every last-in-bucket
version at the key's next non-empty bucket's first lsn, leave the true
final version open, and never resurrect a delete-closed interval."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opendataloader_pdf_spark.cdc.scd2 import (
    scd2_history,
    scd2_history_bucketed,
)


@st.composite
def streams(draw):
    n_docs = draw(st.integers(1, 6))
    n = draw(st.integers(1, 120))
    rows = []
    for lsn in range(n):
        doc = draw(st.integers(0, n_docs - 1))
        op = draw(st.sampled_from(["update", "update", "update", "delete"]))
        rows.append((f"d{doc}", lsn, op, [lsn % 5]))
    width = draw(st.sampled_from([1, 3, 7, 16, 64, 1000]))
    return rows, width


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=streams())
def test_bucketed_equals_plain(spark, case):
    rows, width = case
    ev = spark.createDataFrame(
        rows, "doc_id string, lsn long, op string, tokens array<int>")
    a = scd2_history(ev)
    b = scd2_history_bucketed(ev, bucket_width=width)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
