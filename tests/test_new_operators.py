"""Unit tests for the round-1 additions: as-of join, exact cosine
near-dup pairs, the narrow-probe replay internals, and the linear-verify
MinHash path. Synthetic in-memory rows, mirroring the reference's
operator-test style (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_asof_join_picks_latest_at_or_before(spark):
    events = spark.createDataFrame(
        [(1, 100, 5), (2, 100, 14), (3, 100, 15), (4, 100, 30), (5, 200, 7)],
        "event_id long, user_id long, t long",
    )
    orders = spark.createDataFrame(
        [(100, 10, 1000), (100, 15, 1001), (100, 15, 1002), (200, 99, 2000)],
        "user_id long, t long, orderkey long",
    )
    o1 = orders.groupBy("user_id", "t").agg(F.max("orderkey").alias("last_orderkey"))
    tagged = o1.select(
        "user_id", "t", F.lit(0).alias("tag"), "last_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        events.select(
            "user_id", "t", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("last_orderkey"), "event_id",
        )
    )
    w = (
        Window.partitionBy("user_id").orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r["event_id"]: r["lk"]
        for r in tagged.withColumn(
            "lk", F.last("last_orderkey", ignorenulls=True).over(w)
        ).filter(F.col("tag") == 1).collect()
    }
    assert out[1] is None          # before any order
    assert out[2] == 1000          # after t=10 order only
    assert out[3] == 1002          # t=15 inclusive, max orderkey wins the tie
    assert out[4] == 1002          # still the latest
    assert out[5] is None          # other user, no order yet


def test_cosine_pairs_above_exact(spark):
    from opendataloader_pdf_spark.functions.similarity import cosine_pairs_above

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),     # identical to 1 → cosine 1.0
            (3, [0.0, 1.0]),     # orthogonal
            (4, [1.0, 1.0]),     # cos 0.7071 to 1/2, 0.7071 to 3
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_above(vecs, "vec_id", "embedding", 0.7).collect()
    }
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(1, 4)] == pytest.approx(0.707107, abs=1e-6)
    assert got[(3, 4)] == pytest.approx(0.707107, abs=1e-6)
    assert (1, 3) not in got and (2, 3) not in got


def test_verify_jaccard_pairs_linear_path(spark):
    from opendataloader_pdf_spark.functions.similarity import verify_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in verify_jaccard_pairs(docs, cands, "doc_id", "text",
                                         n=3, threshold=0.3).collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.5   # one word differs
    assert (1, 3) not in got                     # below threshold


def test_replay_audit_totals_match_table_delta(spark, tmp_path):
    """The narrow probe + write-observed/cached stats must agree with the
    actual table: applied inserts == live rows after replaying inserts
    only, and stale events are counted, not applied."""
    from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine

    rows = [
        # lsn, doc, op, tokens, n_tok, source, lang, ver, delivery
        (1, "a", "insert", [1, 2], 2, "s", None, 1, 0),
        (2, "b", "insert", [3], 1, "s", None, 1, 1),
        (3, "a", "update", [9, 9], 2, "s", None, 1, 2),
        (1, "a", "insert", [1, 2], 2, "s", None, 1, 3),  # stale replay of lsn 1
        (4, "b", "delete", None, None, "s", None, 1, 4),
    ]
    ev = spark.createDataFrame(
        rows,
        "lsn long, doc_id string, op string, tokens array<int>, n_tok int, "
        "source string, lang string, schema_version int, delivery_seq long",
    ).withColumn("ts", F.current_timestamp())
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    summary = eng.replay(ev, batch_size=100)

    assert summary.events == 5
    live = {r["doc_id"]: r for r in sink.read().collect()}
    assert set(live) == {"a"}            # b deleted
    assert list(live["a"]["tokens"]) == [9, 9]
    audit = sink.read_audit()
    tot = audit.agg(
        F.sum("updated").alias("u"), F.sum("inserted").alias("i"),
        F.sum("deleted").alias("d"), F.sum("stale").alias("s"),
    ).collect()[0]
    # single batch: the reduce keeps one winner per key — a→lsn3 (no base
    # row yet → inserted), b→lsn4 winning delete (tombstone, no base →
    # deleted); the stale lsn-1 retransmission is absorbed by the reduce.
    assert (tot["i"], tot["u"], tot["d"], tot["s"]) == (1, 0, 1, 0)
    # re-run: everything stale/no-op
    s2 = eng.replay(ev, batch_size=100)
    assert len(s2.batches) == 0


def test_iceberg_sink_contract(spark, tmp_path):
    """Contract parity of the real-cluster sink (runs only when an
    iceberg-spark-runtime jar is present; the sandbox has none)."""
    from opendataloader_pdf_spark.session import iceberg_available

    if not iceberg_available():
        # blocked by environment: the sandbox is fully offline (maven DNS
        # fails, pip index empty — re-verified 2026-08-21 round 5:
        # curl to repo1.maven.org → exit 6 couldn't-resolve) and no cached
        # jar exists anywhere on the box (searched ~/.ivy2, ~/.m2,
        # pyspark/jars, /opt/spark/jars, /usr/share/java — no
        # iceberg/delta/hudi artifact). Set SPARK_ICEBERG_JAR or drop
        # iceberg-spark-runtime into pyspark/jars to run this test.
        pytest.skip("no iceberg runtime jar in this environment (offline "
                    "sandbox; ivy/maven caches and spark dist scanned — "
                    "jar not provisionable)")
    from opendataloader_pdf_spark.cdc.iceberg import IcebergSink
    from opendataloader_pdf_spark.cdc import ReplayEngine
    from opendataloader_pdf_spark.datagen import gen_change_events

    sink = IcebergSink(spark, "db.cdc_contract", n_buckets=8)
    sink.drop()
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    ev = gen_change_events(spark, 5000, 500, seed=11)
    s = eng.replay(ev, batch_size=2000)
    assert s.events == 5100
    again = eng.replay(ev, batch_size=2000)
    assert len(again.batches) == 0


def test_repetition_signals_edges(spark):
    """dup_word/bigram fractions: exact values and the size<2 guard
    (Spark's sequence(0,-1) is DESCENDING — must not fabricate bigrams)."""
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.functions.text import (
        dup_bigram_frac,
        dup_word_frac,
    )

    df = spark.createDataFrame(
        [
            ("a", "x x x x"),          # 4 words 1 distinct → dup 0.75; bigrams 3/1 → 2/3
            ("b", "a b c d"),          # all distinct → 0.0 / 0.0
            ("c", "word"),             # single word → no bigrams
            ("d", ""),                 # empty
            ("e", "a b a b a b"),      # bigrams: 5 total, 2 distinct → 0.6
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["w"], r["b"])
        for r in df.select(
            "doc_id",
            dup_word_frac(F.col("text")).alias("w"),
            dup_bigram_frac(F.col("text")).alias("b"),
        ).collect()
    }
    assert got["a"] == (0.75, round(2 / 3, 6))
    assert got["b"] == (0.0, 0.0)
    assert got["c"] == (0.0, 0.0)
    assert got["d"] == (0.0, 0.0)
    assert got["e"] == (round(2 / 3, 6), 0.6)
