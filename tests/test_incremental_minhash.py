"""Incremental MinHash-LSH: candidates for a new batch against a stored
signature index must equal a from-scratch run over corpus+batch,
restricted to pairs touching the batch — the contract that lets a 100 TB
corpus never be re-shingled."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendataloader_pdf_spark.functions.similarity import (
    minhash_lsh_candidates,
    minhash_lsh_candidates_incremental,
    minhash_signatures,
)

SIG = dict(n=3, k=32, seed=42)
PARAMS = dict(n=3, k=32, bands=8, seed=42)


def _docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # force near-dups across the corpus/batch split: clone some corpus
    # docs into the "new" id range
    clones = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return d.select("doc_id", "text").unionByName(clones)


def test_incremental_matches_batch(spark, sf_dir):
    alld = _docs(spark, sf_dir)
    corpus = alld.filter(F.col("doc_id") < 300)
    batch = alld.filter(F.col("doc_id") >= 300)

    index_sig = minhash_signatures(corpus, "doc_id", "text", **SIG)
    cands, new_sig = minhash_lsh_candidates_incremental(
        batch, index_sig, "doc_id", "text", **PARAMS
    )
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}

    full = minhash_lsh_candidates(alld, "doc_id", "text", **PARAMS)
    new_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert got == want
    assert want, "split produced no cross/batch candidates — test is vacuous"

    # returned signatures are exactly the batch's, same params as index
    sig_rows = new_sig.collect()
    assert {r["id"] for r in sig_rows} == new_ids
    direct = {
        r["id"]: r["sig"]
        for r in minhash_signatures(batch, "doc_id", "text", **SIG).collect()
    }
    assert all(direct[r["id"]] == r["sig"] for r in sig_rows)
