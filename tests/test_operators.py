"""Unit tests for the operator library — synthetic in-memory rows, the
reference's unit-test strategy (SURVEY.md §5.2) Spark-ified."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.functions import similarity as S
from opendataloader_pdf_spark.functions import tokens as TK
from opendataloader_pdf_spark.operators import folds
from opendataloader_pdf_spark.operators import relational as R
from opendataloader_pdf_spark.operators import spatial as sp
from opendataloader_pdf_spark.cdc.schema_evolution import (
    SchemaEvolutionError,
    diff_schemas,
)


# ------------------------------------------------------------- relational

def test_dedup_last_writer_keeps_max_order(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 1, "w")],
        ["k", "seq", "v"],
    )
    out = {r["k"]: r["v"] for r in R.dedup_last_writer(df, ["k"], "seq").collect()}
    assert out == {"a": "y", "b": "w"}


def test_interval_containment_matches_naive(spark):
    rng = np.random.RandomState(7)
    pts = spark.createDataFrame(
        pd.DataFrame({"x": rng.uniform(0, 100, 300)})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": range(40), "lo": rng.uniform(0, 90, 40)})
    ).withColumn("hi", F.col("lo") + 7.5)
    fast = sp.interval_containment_join(pts, iv, "x", "lo", "hi", bucket_width=8.0)
    naive = pts.crossJoin(iv).filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    assert fast.count() == naive.count()
    f = {(round(r["x"], 9), r["iid"]) for r in fast.collect()}
    n = {(round(r["x"], 9), r["iid"]) for r in naive.collect()}
    assert f == n


# ------------------------------------------------------------------ folds

def test_stack_levels_automaton(spark):
    rows = [("u", i, t) for i, t in enumerate(["A", "B", "B", "A", "C"])]
    df = spark.createDataFrame(rows, ["g", "seq", "style"])
    out = folds.stack_levels(df, ["g"], "seq", ["style"])
    got = [r["level"] for r in out.orderBy("seq").collect()]
    assert got == [1, 2, 2, 1, 2]


def test_xy_cut_two_column_with_title(spark):
    # title spans the page; left column reads before right column
    rows = [
        # name, left, right, bottom, top
        ("title", 0.0, 100.0, 90.0, 100.0),
        ("L1", 0.0, 40.0, 70.0, 80.0),
        ("L2", 0.0, 40.0, 50.0, 60.0),
        ("R1", 60.0, 100.0, 70.0, 80.0),
        ("R2", 60.0, 100.0, 50.0, 60.0),
    ]
    df = spark.createDataFrame(
        rows, ["name", "left_x", "right_x", "bottom_y", "top_y"]
    ).withColumn("doc_id", F.lit("d")).withColumn("page", F.lit(0))
    out = folds.xy_cut_order(df)
    order = [r["name"] for r in out.orderBy("reading_rank").collect()]
    assert order[0] == "title"
    assert order.index("L1") < order.index("L2") < order.index("R1") < order.index("R2")


def test_fold_adjacent_merges_runs(spark):
    df = spark.createDataFrame(
        [("g", 1, "a"), ("g", 2, "a"), ("g", 3, "b"), ("g", 4, "a")],
        ["g", "seq", "t"],
    )
    schema = T.StructType([
        T.StructField("t", T.StringType()),
        T.StructField("n", T.IntegerType()),
    ])

    def merge_when(pdf):
        same = pdf["t"].values[1:] == pdf["t"].values[:-1]
        return np.concatenate(([False], same))

    out = folds.fold_adjacent(
        df, ["g"], "seq", merge_when, schema,
        lambda g: {"t": g["t"].iloc[0], "n": len(g)},
    )
    got = [(r["t"], r["n"]) for r in out.collect()]
    assert sorted(got) == [("a", 1), ("a", 2), ("b", 1)]


# ------------------------------------------------------------- token UDFs

@pytest.fixture(scope="module")
def token_df(spark):
    rng = np.random.RandomState(3)
    arrays = [rng.randint(0, 50257, rng.randint(1, 50)).astype(np.int32).tolist()
              for _ in range(100)] + [[]]
    pdf = pd.DataFrame({"i": range(101), "tokens": arrays})
    return spark.createDataFrame(
        pdf, schema="i long, tokens array<int>"
    ), arrays


def test_token_udfs_match_python_reference(spark, token_df):
    df, arrays = token_df
    got = (
        df.select(
            "i",
            TK.token_sum("tokens").alias("s"),
            TK.token_distinct_count("tokens").alias("d"),
            TK.token_fingerprint("tokens").alias("fp"),
        )
        .orderBy("i")
        .collect()
    )
    P1, P2, B1, B2 = (1 << 31) - 1, (1 << 29) - 3, 1_000_003, 999_983
    for r, arr in zip(got, arrays):
        assert r["s"] == sum(arr)
        assert r["d"] == len(set(arr))
        h1 = h2 = 0
        for v in arr:
            h1 = (h1 * B1 + v) % P1
            h2 = (h2 * B2 + v) % P2
        assert r["fp"] == h1 * (1 << 31) + h2


def test_splice_tokens(spark):
    df = spark.createDataFrame(
        [(list(range(10)),)], schema="tokens array<int>"
    )
    out = df.select(
        TK.splice_tokens(
            F.col("tokens"), F.lit(3), F.lit(4), F.array(F.lit(99), F.lit(98))
        ).alias("t")
    ).collect()[0]["t"]
    assert out == [0, 1, 2, 99, 98, 7, 8, 9]


# ------------------------------------------------------------- similarity

def test_simhash_identical_and_near(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content about spark shuffles and partitions"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    sh = {r["id"]: r["sh"] for r in df.select("id", S.simhash(F.col("text")).alias("sh")).collect()}
    assert sh[0] == sh[1]
    d02 = bin((sh[0] ^ sh[2]) & ((1 << 64) - 1)).count("1")
    assert d02 > 4


def test_minhash_dedup_removes_exact_twins(spark):
    base = [(i, f"word{i} alpha beta gamma delta epsilon zeta eta theta iota kappa") for i in range(20)]
    dup = [(i + 1000, t) for i, t in base]
    df = spark.createDataFrame(base + dup, ["doc_id", "text"])
    out = S.minhash_dedup(df, "doc_id", "text", n=3, k=16, bands=8, jaccard_threshold=0.95)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every exact twin collapsed to the min-id representative
    assert all(i in kept and (i + 1000) not in kept for i in range(20))


def test_lsh_topk_contains_self(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 8).astype(float)
    pdf = pd.DataFrame({"vec_id": range(30), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")
    out = S.lsh_topk(df, df.filter(F.col("vec_id") < 5), "vec_id", "embedding",
                     "vec_id", dim=8, k=3, n_planes=6)
    got = out.filter(F.col("rk") == 1).collect()
    # self is always in the same bucket → rank-1 neighbor is itself
    assert all(r["neighbor_id"] == r["query_id"] for r in got)
    assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in got)


# -------------------------------------------------------- schema evolution

def _st(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_diff_schemas_additive_and_widening():
    table = _st(("a", T.IntegerType()), ("b", T.StringType()))
    batch = _st(("a", T.LongType()), ("c", T.DoubleType()))
    out = diff_schemas(table, batch)
    assert [f.name for f in out.fields] == ["a", "b", "c"]
    assert out["a"].dataType == T.LongType()


def test_diff_schemas_rejects_incompatible():
    with pytest.raises(SchemaEvolutionError):
        diff_schemas(_st(("a", T.IntegerType())), _st(("a", T.StringType())))
    # narrowing on the batch side is tolerated (reads widen by cast)
    out = diff_schemas(_st(("a", T.LongType())), _st(("a", T.IntegerType())))
    assert out["a"].dataType == T.LongType()


def test_token_distinct_count_negative_ids(spark):
    """Review follow-up: a negative int32 token id sign-extends and
    clobbers the row id in the composite sort key, merging tokens
    across rows in the same Arrow batch."""
    from opendataloader_pdf_spark.functions.tokens import token_distinct_count

    df = spark.createDataFrame(
        [(1, [-1, -1]), (2, [-1, 5]), (3, [7])],
        "id int, tokens array<int>",
    ).coalesce(1)  # one Arrow batch: the collision preconditions
    got = {r["id"]: r["n"] for r in
           df.select("id", token_distinct_count("tokens").alias("n")).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_pack_offset_rows_frame_no_tied_overflow(spark):
    """Review follow-up: the default RANGE window frame includes ORDER
    BY peers, so tied order values claimed the same offset and
    overflowed the budget; the explicit ROWS frame packs them
    sequentially."""
    from opendataloader_pdf_spark.operators.packing import pack_offset

    df = spark.createDataFrame(
        [("s", 1, 60, "a"), ("s", 1, 60, "b"), ("s", 2, 30, "c")],
        "src string, ord int, n int, doc string",
    )
    out = pack_offset(df, ["src"], "ord", "n", budget=100)
    offs = sorted((r["pack_id"], r["pack_off"]) for r in out.collect())
    # 60+60+30 packs as [0..60), [60->overflow to pack 1 at 20), ...
    assert offs == [(0, 0), (0, 60), (1, 20)]
    # no two docs share (pack_id, pack_off)
    assert len(set(offs)) == 3


def test_blank_docs_have_zero_shingles_and_pass_decontamination(spark):
    from opendataloader_pdf_spark.functions.similarity import decontaminate

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the quick brown fox")],
        "id long, text string",
    )
    bench = spark.createDataFrame([(9, "")], "id long, text string")
    got = {r["id"]: r for r in
           decontaminate(docs, bench, "id", "text").collect()}
    assert got[1]["n_sh"] == 0 and not got[1]["contaminated"]
    assert got[2]["n_sh"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_sh"] > 0 and not got[3]["contaminated"]


def test_lm_score_emits_short_docs(spark):
    from opendataloader_pdf_spark.functions.lm import lm_score

    docs = spark.createDataFrame(
        [(1, "one"), (2, None), (3, "a proper multi word document here "
                                    "with repeated words here")],
        "id long, text string",
    )
    got = {r["id"]: r for r in lm_score(docs, "id", "text").collect()}
    assert set(got) == {1, 2, 3}          # nothing vanishes
    assert got[1]["n_bigrams"] == 0 and not got[1]["keep"]
    assert got[2]["n_bigrams"] == 0 and not got[2]["keep"]
    assert got[3]["n_bigrams"] > 0


def test_spatial_joins_refuse_outer_how(spark):
    import pytest as _pytest

    pts = spark.createDataFrame([(1.0,)], "x double")
    iv = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with _pytest.raises(ValueError, match="inner"):
        sp.interval_containment_join(pts, iv, "x", "lo", "hi",
                                     bucket_width=1.0, how="left")


def test_lsh_bands_must_divide_k(spark):
    import pytest as _pytest

    from opendataloader_pdf_spark.functions.similarity import (
        minhash_lsh_candidates,
    )

    docs = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    with _pytest.raises(ValueError, match="does not divide"):
        minhash_lsh_candidates(docs, "id", "text", k=32, bands=5)
