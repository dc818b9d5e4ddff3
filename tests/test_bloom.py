"""Per-delta bloom filters (cdc/bloom.py + MergeOnReadSink bloom_bits):
file skipping beyond key min/max, with the one-sided safety invariant
— never a false negative — pinned by a property test."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc import MergeOnReadSink, ReplayEngine
from opendataloader_pdf_spark.cdc.bloom import (
    build_blooms,
    may_contain,
    pack_bitmap,
    probe_positions,
)

EVENT_COLS = ("doc_id string, lsn long, op string, tokens array<int>, "
              "n_tok int, source string, schema_version int, ts timestamp, "
              "delivery_seq long")


def _events(spark, specs):
    rows = [(d, lsn, op, toks, len(toks) if toks else None, "s", 1, None, lsn)
            for d, lsn, op, toks in specs]
    return spark.createDataFrame(rows, EVENT_COLS)


def test_pack_and_may_contain_basics():
    bl = {"bits": 64, "k": 2, "n": 1, "hex": pack_bitmap([3, 9], 64)}
    assert may_contain(bl, [3, 9])
    assert not may_contain(bl, [3, 10])
    # geometry mismatch degrades to "maybe", never to a skip
    assert may_contain(bl, [3])


def test_bloom_skips_in_range_absent_key(spark, tmp_path):
    # one bucket so every key lands in the same delta; keys a10..a98
    # even — the delta's RANGE contains 'a11' but its bloom must not
    specs = [(f"a{i}", i, "update", [i, i + 1]) for i in range(10, 100, 2)]
    sink = MergeOnReadSink(spark, str(tmp_path / "t"), n_buckets=1,
                           bloom_bits=2048)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(_events(spark, specs), batch_size=1_000)

    deltas = [d for e in sink.manifest()["buckets"].values()
              for d in e.get("deltas", [])]
    assert deltas and all("bloom" in d for d in deltas)
    assert all(d["key_min"] <= "a11" <= d["key_max"] for d in deltas)

    absent = sink.lookup(["a11"])
    assert absent.count() == 0
    opened = absent.inputFiles()
    for d in deltas:  # range can't prune these — only the bloom can
        assert not any(d["path"] + "/" in f for f in opened), (
            f"bloom failed to skip {d['path']}")

    # present key: delta IS opened and the row comes back right
    hit = sink.lookup(["a12"])
    rows = hit.collect()
    assert [(r["doc_id"], r["lsn"]) for r in rows] == [("a12", 12)]
    assert any(deltas[0]["path"] + "/" in f for f in hit.inputFiles())


def test_bloomless_deltas_still_read(spark, tmp_path):
    specs = [(f"b{i}", i, "update", [i]) for i in range(1, 20)]
    sink = MergeOnReadSink(spark, str(tmp_path / "t"), n_buckets=1)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(_events(spark, specs), batch_size=1_000)
    deltas = [d for e in sink.manifest()["buckets"].values()
              for d in e.get("deltas", [])]
    assert deltas and all("bloom" not in d for d in deltas)
    assert sink.lookup(["b7"]).count() == 1


def test_mixed_geometry_manifest(spark, tmp_path):
    """bloom_bits reconfigured mid-table: old and new deltas coexist
    and the prober hashes per recorded geometry."""
    sink = MergeOnReadSink(spark, str(tmp_path / "t"), n_buckets=1,
                           bloom_bits=512)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(_events(spark, [("c1", 1, "update", [1])]), batch_size=10)
    sink.bloom_bits = 4096
    eng.replay(_events(spark, [("c2", 12, "update", [2])]), batch_size=10)
    geoms = {d["bloom"]["bits"]
             for e in sink.manifest()["buckets"].values()
             for d in e.get("deltas", [])}
    assert geoms == {512, 4096}
    got = sorted(r["doc_id"] for r in sink.lookup(["c1", "c2"]).collect())
    assert got == ["c1", "c2"]


@pytest.fixture(scope="module")
def _bloom_spark(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(keys=st.lists(st.text(alphabet="abcdefghij0123456789", min_size=1,
                             max_size=12), min_size=1, max_size=40,
                     unique=True))
def test_no_false_negatives_property(_bloom_spark, keys):
    """Every inserted key must test 'maybe' — a false negative would
    silently drop that key's newest version from the LWW fold."""
    spark = _bloom_spark
    bits, k = 256, 3  # deliberately tiny: high collision pressure
    df = spark.createDataFrame(
        [(0, x) for x in keys], "bucket int, doc_id string")
    bl = build_blooms(df, "doc_id", bits, k)[0]
    assert bl["n"] == len(keys)
    pos = probe_positions(spark, keys, T.StringType(), bits, k)
    for x in keys:
        assert may_contain(bl, pos[x]), f"false negative for {x!r}"
