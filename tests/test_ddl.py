"""In-stream DDL (cdc/ddl.py): schema-change events carried in the
change stream — parse, timeline validation, epoch stamping, premature
dead-lettering, boundary semantics, and kill/resume."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import ParquetMergeSink
from opendataloader_pdf_spark.cdc.ddl import (
    DdlEvent,
    assign_epochs,
    collect_timeline,
    parse_ddl,
    registry_from_timeline,
    replay_ddl_stream,
)
from opendataloader_pdf_spark.cdc.engine import JobKilled, default_registry
from opendataloader_pdf_spark.cdc.schema_evolution import SchemaEvolutionError

EVENT_COLS = ("op string, lsn long, doc_id string, tokens array<int>, "
              "n_tok int, source string, lang string, ts timestamp, "
              "delivery_seq long, ddl string")


def _row(op, lsn, doc=None, toks=None, lang=None, ddl=None):
    return (op, lsn, doc, toks, len(toks) if toks else None,
            "s", lang, None, lsn if op != "ddl" else None, ddl)


def _stream(spark, rows):
    return spark.createDataFrame([_row(*r) for r in rows], EVENT_COLS)


def test_parse_and_timeline(spark):
    df = spark.createDataFrame(
        [(10, "ALTER TABLE t ADD COLUMN lang string"),
         (20, "alter table  t alter column n_tok type  bigint"),
         (30, "ALTER TABLE t ADD COLUMN emb array<float>")],
        "lsn long, ddl string",
    )
    tl = collect_timeline(parse_ddl(df))
    assert tl == [
        DdlEvent(10, "add_column", "lang", "string"),
        DdlEvent(20, "widen_column", "n_tok", "bigint"),
        DdlEvent(30, "add_column", "emb", "array<float>"),
    ]


def test_unparseable_and_bad_type_rejected(spark):
    bad = spark.createDataFrame(
        [(5, "DROP TABLE t")], "lsn long, ddl string")
    with pytest.raises(SchemaEvolutionError, match="unparseable"):
        collect_timeline(parse_ddl(bad))
    odd = spark.createDataFrame(
        [(5, "ALTER TABLE t ADD COLUMN x geometry")], "lsn long, ddl string")
    with pytest.raises(SchemaEvolutionError, match="unsupported DDL type"):
        collect_timeline(parse_ddl(odd))


def test_registry_validation():
    base = default_registry()[1]
    reg = registry_from_timeline(
        base, [DdlEvent(10, "add_column", "lang", "string"),
               DdlEvent(20, "widen_column", "n_tok", "bigint")])
    assert [f.name for f in reg[2].fields][-1] == "lang"
    assert dict((f.name, f.dataType) for f in reg[3].fields)[
        "n_tok"] == T.LongType()
    with pytest.raises(SchemaEvolutionError, match="adds existing"):
        registry_from_timeline(base, [DdlEvent(1, "add_column", "n_tok", "int")])
    with pytest.raises(SchemaEvolutionError, match="unknown column"):
        registry_from_timeline(base, [DdlEvent(1, "widen_column", "zz", "long")])
    with pytest.raises(SchemaEvolutionError, match="narrow"):
        registry_from_timeline(base, [DdlEvent(1, "widen_column", "n_tok", "short")])


def test_epoch_boundary_row_at_ddl_lsn(spark):
    """A row AT the DDL's lsn belongs to the NEW epoch (the binlog
    orders the DDL before any row event sharing its position)."""
    tl = [DdlEvent(100, "add_column", "lang", "string")]
    df = spark.createDataFrame([(99,), (100,), (101,)], "lsn long")
    got = {r["lsn"]: r["schema_version"]
           for r in assign_epochs(df, tl).collect()}
    assert got == {99: 1, 100: 2, 101: 2}


def _final(sink):
    rows = sink.read().orderBy("doc_id").collect()
    return [(r["doc_id"], r["lsn"], list(r["tokens"]), r["lang"]) for r in rows]


def test_replay_ddl_stream_end_to_end(spark, tmp_path):
    rows = [
        ("update", 2, "a", [1, 2]),
        ("update", 4, "b", [3]),
        # premature: populates lang before the DDL at lsn 5 → dead-letter
        ("update", 6 - 2, "c", [9], "xx"),
        ("ddl", 5, None, None, None, "ALTER TABLE t ADD COLUMN lang string"),
        ("update", 6, "a", [1, 2, 3], "en"),
        ("ddl", 7, None, None, None,
         "alter table t alter column n_tok type bigint"),
        ("update", 8, "b", [4, 5], "de"),
        ("delete", 10, "c", None),
    ]
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    summary, tl, n_pre = replay_ddl_stream(
        spark, sink, _stream(spark, rows), batch_size=4)
    assert len(tl) == 2 and n_pre == 1
    # the dead-letter table holds exactly the premature row
    q = spark.read.parquet(os.path.join(sink.root, "_ddl_quarantine"))
    assert [(r["doc_id"], r["lsn"]) for r in q.collect()] == [("c", 4)]
    assert _final(sink) == [("a", 6, [1, 2, 3], "en"), ("b", 8, [4, 5], "de")]
    fin = {f.name: f.dataType.simpleString()
           for f in sink.current_schema().fields}
    assert fin["lang"] == "string" and fin["n_tok"] == "bigint"
    assert summary.applied > 0


def test_replay_ddl_stream_kill_resume(spark, tmp_path):
    rows = [
        ("update", 1, "a", [1]),
        ("update", 2, "b", [2]),
        ("ddl", 9, None, None, None, "ALTER TABLE t ADD COLUMN lang string"),
        ("update", 10, "a", [1, 1], "en"),
        ("update", 18, "b", [2, 2], "fr"),
    ]
    stream = _stream(spark, rows)
    ref = ParquetMergeSink(spark, str(tmp_path / "ref"), n_buckets=4)
    replay_ddl_stream(spark, ref, stream, batch_size=8)

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(JobKilled):
        replay_ddl_stream(spark, sink, stream, batch_size=8, fail_after=1)
    # resume: same call, engine picks up at the committed batch — final
    # state must equal the uninterrupted twin byte-for-byte
    replay_ddl_stream(spark, sink, stream, batch_size=8)
    assert _final(sink) == _final(ref)
