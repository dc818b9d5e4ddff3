"""SCD2 history materialization and primary-key-change expansion."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc.events import expand_rekey, last_writer_wins
from opendataloader_pdf_spark.cdc.scd2 import scd2_extend, scd2_history


def _ch(spark, rows):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ])
    return spark.createDataFrame(rows, schema)


def test_scd2_intervals_and_delete_closure(spark):
    hist = scd2_history(_ch(spark, [
        ("a", 1, "update", [1]),
        ("a", 4, "update", [4]),
        ("a", 9, "delete", None),   # closes version 4..9, emits nothing
        ("b", 2, "update", [2]),    # open forever
    ]))
    got = {(r["doc_id"], r["valid_from"]): r for r in hist.collect()}
    assert got[("a", 1)]["valid_to"] == 4 and not got[("a", 1)]["is_current"]
    assert got[("a", 4)]["valid_to"] == 9 and not got[("a", 4)]["is_current"]
    assert ("a", 9) not in got
    assert got[("b", 2)]["valid_to"] is None and got[("b", 2)]["is_current"]


def test_scd2_extend_equals_rebuild(spark):
    ev = spark.range(0, 3000).select(
        F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.when(F.col("id") % 17 == 5, F.lit("delete"))
        .otherwise(F.lit("update")).alias("op"),
        F.array((F.col("id") % 11).cast("int")).alias("tokens"),
    )
    hist1 = scd2_history(ev.filter(F.col("lsn") < 1500))
    inc = scd2_extend(hist1, ev.filter(F.col("lsn") >= 1500))
    full = scd2_history(ev)
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_rekey_expands_to_atomic_pair(spark):
    ev = _ch(spark, [
        ("a", 1, "update", [1]),
        ("a", 5, "rekey", [5]),     # a -> z at lsn 5
        ("z", 3, "update", [3]),    # pre-existing z, loses to the insert
        ("b", 2, "update", [2]),
    ]).withColumn(
        "new_doc_id",
        F.when(F.col("op") == "rekey", F.lit("z")).otherwise(F.lit(None)),
    )
    out = expand_rekey(ev)
    rows = {(r["doc_id"], r["lsn"], r["op"]): r for r in out.collect()}
    assert rows[("a", 5, "delete")]["tokens"] is None
    assert rows[("z", 5, "insert")]["tokens"] == [5]
    assert ("a", 5, "rekey") not in rows
    # final fold: a is gone, z carries the rekeyed payload
    final = last_writer_wins(out)
    got = {r["doc_id"]: r for r in final.collect()}
    assert got["a"]["op"] == "delete"
    assert got["z"]["op"] == "insert" and got["z"]["tokens"] == [5]
    assert got["b"]["tokens"] == [2]


def test_rekey_plan_is_narrow(spark):
    ev = _ch(spark, [("a", 1, "rekey", [1])]).withColumn(
        "new_doc_id", F.lit("b"))
    plan = expand_rekey(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rekey_passes_malformed_null_op_through(spark):
    # an op=NULL row must survive the expansion so the engine's
    # quarantine can dead-letter it (null-safe eqNullSafe filter)
    ev = _ch(spark, [
        ("a", 1, None, [1]),
        ("a", 2, "rekey", [2]),
    ]).withColumn(
        "new_doc_id",
        F.when(F.col("op") == "rekey", F.lit("b")).otherwise(F.lit(None)),
    )
    out = expand_rekey(ev).collect()
    ops = sorted((r["doc_id"], r["op"] or "NULL") for r in out)
    assert ("a", "NULL") in ops          # malformed row preserved
    assert ("a", "delete") in ops and ("b", "insert") in ops
