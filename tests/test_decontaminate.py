"""decontaminate: exact overlap fractions against a pooled benchmark
shingle set; benchmark members self-flag at frac=1.0."""

from __future__ import annotations

from opendataloader_pdf_spark.functions.similarity import decontaminate


def test_decontaminate_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            # doc 2 contains the benchmark doc verbatim plus extra text
            (2, "prefix words here the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated content about spark engines and parquet"),
        ],
        "doc_id: long, text: string",
    )
    bench = docs.filter("doc_id = 1")
    out = {
        r["id"]: r
        for r in decontaminate(docs, bench, "doc_id", "text", n=3,
                               threshold=0.5).collect()
    }
    assert out[1]["frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["contaminated"] and out[2]["n_hit"] == out[1]["n_sh"]
    assert out[3]["n_hit"] == 0 and not out[3]["contaminated"]


def test_decontaminate_short_and_null_docs(spark):
    # sub-n-gram documents produce one shingle and still get a row;
    # null-text docs must surface as clean n_sh=0 rows, never vanish
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello"), (3, "two words"), (4, None)],
        "doc_id: long, text: string",
    )
    bench = docs.filter("doc_id = 1")
    out = {
        r["id"]: r
        for r in decontaminate(docs, bench, "doc_id", "text").collect()
    }
    assert out[2]["frac"] == 1.0
    assert out[3]["n_hit"] == 0 and out[3]["n_sh"] == 1
    assert out[4]["n_sh"] == 0 and out[4]["frac"] == 0.0
    assert not out[4]["contaminated"]
