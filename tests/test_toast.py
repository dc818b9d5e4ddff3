"""TOAST-sentinel (unchanged-column) updates: cdc/toast.py."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import ParquetMergeSink
from opendataloader_pdf_spark.cdc.toast import reduce_batch_toast, resolve_toast


def _ev(spark, rows):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


TBL = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def _narrow(sink):
    return sink.read(include_deleted=True).select("doc_id", "lsn", "tokens")


def test_reduce_and_resolve_single_batch(spark):
    batch = _ev(spark, [
        # a: full write then toast update (meta changes, tokens carried)
        ("a", 1, "update", [1, 2], 2, "s1"),
        ("a", 5, "update", None, None, "s2"),
        # b: disorder inside the batch — toast delivered "between" writes
        ("b", 9, "update", None, None, "s9"),
        ("b", 4, "update", [4], 1, "s4"),
        ("b", 2, "update", [2, 2], 2, "s2"),
        # c: toast-first, no image anywhere -> violation
        ("c", 3, "update", None, None, "sc"),
        # d: delete wins; image carried into the tombstone row
        ("d", 1, "update", [7, 7], 2, "sd"),
        ("d", 6, "delete", None, None, None),
    ])
    red = reduce_batch_toast(batch)
    empty = spark.createDataFrame([], TBL).select("doc_id", "lsn", "tokens")
    completed, violations = resolve_toast(red, empty)
    got = {r["doc_id"]: r for r in completed.collect()}
    assert got["a"]["lsn"] == 5 and got["a"]["tokens"] == [1, 2]
    assert got["a"]["source"] == "s2" and got["a"]["n_tok"] == 2
    assert got["b"]["lsn"] == 9 and got["b"]["tokens"] == [4]
    assert got["d"]["op"] == "delete" and got["d"]["tokens"] == [7, 7]
    v = violations.collect()
    assert [r["doc_id"] for r in v] == ["c"]


def test_cross_batch_carry_forward_and_revive(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.initialize(None, TBL)

    def apply(batch, bid):
        red = reduce_batch_toast(batch)
        completed, viol = resolve_toast(red, _narrow(sink))
        assert viol.count() == 0
        sink.merge(completed, bid)

    apply(_ev(spark, [
        ("x", 1, "update", [1, 1], 2, "s1"),
        ("y", 2, "update", [2], 1, "s1"),
    ]), 0)
    # batch 2: toast metadata update on x; delete y (tombstone keeps image)
    apply(_ev(spark, [
        ("x", 10, "update", None, None, "s2"),
        ("y", 11, "delete", None, None, None),
    ]), 1)
    got = {r["doc_id"]: r for r in sink.read().collect()}
    assert set(got) == {"x"}
    assert got["x"]["tokens"] == [1, 1] and got["x"]["source"] == "s2"
    assert got["x"]["lsn"] == 10
    # batch 3: toast revive of y inherits the pre-delete image
    apply(_ev(spark, [
        ("y", 20, "update", None, None, "s3"),
    ]), 2)
    got = {r["doc_id"]: r for r in sink.read().collect()}
    assert got["y"]["tokens"] == [2] and got["y"]["lsn"] == 20
    assert got["y"]["source"] == "s3"


def test_fresh_batch_image_beats_stale_base_image(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.initialize(None, TBL)
    red = reduce_batch_toast(_ev(spark, [
        ("z", 1, "update", [9], 1, "s1"),
    ]))
    completed, _ = resolve_toast(red, _narrow(sink))
    sink.merge(completed, 0)
    # batch 2 carries BOTH a newer image (lsn 5) and a newer toast (lsn 8):
    # final tokens must be the lsn-5 image, not the base lsn-1 one
    red = reduce_batch_toast(_ev(spark, [
        ("z", 5, "update", [5, 5, 5], 3, "s5"),
        ("z", 8, "update", None, None, "s8"),
    ]))
    completed, _ = resolve_toast(red, _narrow(sink))
    sink.merge(completed, 1)
    row = sink.read().collect()[0]
    assert row["tokens"] == [5, 5, 5] and row["source"] == "s8"
    assert row["lsn"] == 8 and row["n_tok"] == 3


def test_resolve_plan_never_shuffles_base(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.initialize(None, TBL)
    red = reduce_batch_toast(_ev(spark, [("p", 1, "update", [1], 1, "s")]))
    completed, _ = resolve_toast(red, _narrow(sink))
    sink.merge(completed, 0)
    red = reduce_batch_toast(_ev(spark, [("p", 4, "update", None, None, "t")]))
    completed, _ = resolve_toast(red, _narrow(sink))
    plan = completed._jdf.queryExecution().executedPlan().toString()
    # the base side reaches the resolve via broadcast joins only
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
