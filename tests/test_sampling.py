"""hash_split: determinism, partition-layout independence, append
stability, boundary coverage."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from opendataloader_pdf_spark.functions.sampling import (
    hash_split,
    split_boundaries,
)

W = {"train": 0.9, "val": 0.05, "test": 0.05}


def _py_assign(i: int, salt: str = "v1") -> str:
    bkt = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:4], 16)
    for name, hi in split_boundaries(W):
        if bkt < hi:
            return name
    raise AssertionError


def test_matches_reference_hash(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", W).collect()
    }
    assert got == {i: _py_assign(i) for i in range(2000)}


def test_layout_independent_and_stable(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    b = a.repartition(17)
    ra = dict(hash_split(a, "doc_id", W).collect())
    rb = dict(hash_split(b, "doc_id", W).collect())
    assert ra == rb


def test_append_only_growth(spark):
    # old rows keep their split when the corpus doubles
    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    rs = dict(hash_split(small, "doc_id", W).collect())
    rb = dict(hash_split(big, "doc_id", W).collect())
    assert all(rb[k] == v for k, v in rs.items())


def test_proportions(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["n"]
        for r in hash_split(df, "doc_id", W)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(counts["train"] / 20000 - 0.9) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    assert abs(counts["test"] / 20000 - 0.05) < 0.01


def test_mixture_rates_and_nesting(spark):
    from opendataloader_pdf_spark.functions.sampling import mixture_sample

    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    s50 = mixture_sample(df, "doc_id", "source", {"a": 0.5, "b": 1.0})
    s30 = mixture_sample(df, "doc_id", "source", {"a": 0.3, "b": 1.0})
    n_a50 = s50.filter(F.col("source") == "a").count()
    n_a30 = s30.filter(F.col("source") == "a").count()
    assert abs(n_a50 / 5000 - 0.5) < 0.03
    assert abs(n_a30 / 5000 - 0.3) < 0.03
    assert s50.filter(F.col("source") == "b").count() == 5000
    # nesting: the 30% sample is a subset of the 50% sample (same salt)
    ids50 = {r["doc_id"] for r in s50.select("doc_id").collect()}
    ids30 = {r["doc_id"] for r in s30.select("doc_id").collect()}
    assert ids30 <= ids50


def test_mixture_unlisted_source_dropped(spark):
    from opendataloader_pdf_spark.functions.sampling import mixture_sample

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("mystery").alias("source")
    )
    assert mixture_sample(df, "doc_id", "source", {"a": 1.0}).count() == 0


def test_salt_redeal(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = dict(hash_split(df, "doc_id", W, salt="v1").collect())
    b = dict(hash_split(df, "doc_id", W, salt="v2").collect())
    assert a != b  # a new salt re-deals (astronomically unlikely to match)
