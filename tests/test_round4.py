"""Round-4 additions: checkable IVF twin, banded LSH top-k, and the
ANN recall-quality entry (the engine's analog of the reference's
published quality-vs-ground-truth tables, content/docs/benchmark/
nid.mdx). Complements the strict DuckDB oracles with invariants the
value-hash can't see: numpy-vs-JVM assignment agreement, recall
dominance of the OR-construction, and plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import opendataloader_pdf_spark.functions.similarity as S


def _emb(spark, sf_dir):
    from opendataloader_pdf_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_walsh_codebook_equal_norm_orthogonal():
    M = np.array(S.walsh_codebook(64, 8))
    assert M.shape == (8, 64)
    assert set(np.unique(M)) == {-1.0, 1.0}
    G = M @ M.T
    assert np.allclose(np.diag(G), 64.0)  # equal norms: argmax dot == argmax cos
    assert np.allclose(G - np.diag(np.diag(G)), 0.0)  # pairwise orthogonal


def test_ivf_jvm_assignment_matches_numpy_argmax(spark, sf_dir):
    """The JVM ordered-fold cell assignment in ivf_topk_jvm lands every
    corpus vector in the same cell numpy argmax picks (lowest cell on
    ties) — the twin checks the same algorithm, not a different one."""
    emb = _emb(spark, sf_dir)
    cb = S.walsh_codebook(64, 8)
    q = emb.filter(F.col("vec_id") < 20)
    out = S.ivf_topk_jvm(emb, q, "vec_id", "embedding", "vec_id", cb,
                         k=5, nprobe=8)  # nprobe=all cells → exact
    exact = S.brute_force_topk(emb, q, "vec_id", "embedding", "vec_id", k=5)
    e = {(r.query_id, r.neighbor_id, r.cosine) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id, r.cosine) for r in out.collect()}
    assert a == e  # probing every cell degrades IVF to exact search

    # spot-check assignment itself against numpy
    C = np.array(cb)
    pdf = emb.limit(50).toPandas()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    want = np.argmax(V @ C.T, axis=1)
    cells = [F.array(*[F.lit(x) for x in c]) for c in cb]
    sims = F.array(*[
        F.aggregate(F.zip_with("embedding", c, lambda x, y: x * y),
                    F.lit(0.0), lambda acc, t: acc + t)
        for c in cells
    ])
    got = (
        spark.createDataFrame(pdf)
        .select((F.array_position(sims, F.array_max(sims)) - 1).alias("cell"))
        .toPandas()["cell"].to_numpy()
    )
    assert (got == want).all()


def test_banded_recall_dominates_single_signature(spark, sf_dir):
    """OR-construction recall ≥ single-signature recall on the same
    data, and every banded candidate's cosine is the true cosine."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, q, "vec_id", "embedding", "vec_id", k=5)
    single = S.lsh_topk(emb, q, "vec_id", "embedding", "vec_id",
                        dim=64, k=5, n_planes=8)
    banded = S.lsh_topk_banded(emb, q, "vec_id", "embedding", "vec_id",
                               dim=64, k=5, planes_per_band=2, bands=6)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    s = {(r.query_id, r.neighbor_id) for r in single.collect()}
    b = {(r.query_id, r.neighbor_id) for r in banded.collect()}
    assert len(e & b) >= len(e & s)
    assert len(e & b) / len(e) >= 0.75

    truth = S.brute_force_topk(emb, q, "vec_id", "embedding", "vec_id",
                               k=10_000)
    wrong = banded.join(truth, ["query_id", "neighbor_id"]).filter(
        banded["cosine"] != truth["cosine"]
    )
    assert wrong.count() == 0


def test_ann_recall_entry_floors_and_shape(spark, sf_dir):
    from opendataloader_pdf_spark.queries import _ANN_RECALL_FLOORS, QUERIES

    got = QUERIES["ann_recall"].fn(spark, sf_dir).toPandas()
    assert sorted(got["method"]) == ["ivf_topk", "lsh_banded", "lsh_topk"]
    assert (got["n_queries"] == 20).all()
    for _, r in got.iterrows():
        assert r["mean_recall"] >= _ANN_RECALL_FLOORS[r["method"]]
        assert 0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0


def test_banded_candidate_join_is_bucketed(spark, sf_dir):
    """Plan shape: the banded candidate join is an equi-join on
    (band, sig) with the query side broadcast — no cartesian product
    anywhere in the candidate generation."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    banded = S.lsh_topk_banded(emb, q, "vec_id", "embedding", "vec_id",
                               dim=64, k=5, planes_per_band=2, bands=6)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wav_codec_roundtrip_and_rejection():
    """The stdlib WAV codec is a real codec: round-trips frames exactly
    and rejects corrupted / non-PCM payloads instead of emitting silent
    garbage (same contract as decode_png)."""
    import struct

    import pytest

    from opendataloader_pdf_spark.functions import multimodal as M

    samples = ((np.arange(300, dtype=np.int64) * 773) % 65536 - 32768).astype(
        np.int16
    )
    wav = M.encode_wav_pcm16(samples, rate=11000, channels=2)
    ch, rate, nf, got = M.decode_wav(wav)
    assert (ch, rate, nf) == (2, 11000, 150)
    assert (got == samples).all()

    with pytest.raises(ValueError):  # not RIFF
        M.decode_wav(b"JUNK" + wav[4:])
    with pytest.raises(ValueError):  # container size field corrupted
        M.decode_wav(wav[:4] + struct.pack("<I", 5) + wav[8:])
    # non-PCM format tag in the fmt chunk must be rejected
    bad = bytearray(wav)
    fmt_at = wav.index(b"fmt ")
    bad[fmt_at + 8:fmt_at + 10] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError):
        M.decode_wav(bytes(bad))


def test_wav_media_decode_matches_generator(spark, sf_dir):
    """documents_as_wav_media → decode_wav_stats recovers the generator's
    closed form through the full encode→RIFF-walk→decode path."""
    from opendataloader_pdf_spark.functions import multimodal as M
    from opendataloader_pdf_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = M.decode_wav_stats(M.documents_as_wav_media(docs)).toPandas()
    assert len(got) == 40
    for _, r in got.iterrows():
        did = int(r["media_id"])
        n, ch = 50 + did % 211, 1 + did % 2
        assert r["n_frames"] == n and r["n_channels"] == ch
        assert r["sample_rate"] == 8000 + (did % 5) * 1000
        j = np.arange(n * ch, dtype=np.int64)
        amp = (did * 31 + j * 17) % 65536 - 32768
        assert r["amp_sum"] == amp.sum() and r["amp_max"] == amp.max()


def test_avi_codec_roundtrip_and_rejection():
    """The stdlib AVI codec is a real container codec: round-trips
    frames exactly (incl. BGR order, bottom-up rows, stride padding —
    w=5 forces a 1-byte row pad) and rejects corrupted / compressed
    payloads instead of emitting silent garbage (same contract as
    decode_png / decode_wav)."""
    import struct

    import pytest

    from opendataloader_pdf_spark.functions import multimodal as M

    rng = (np.arange(4 * 6 * 5 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8)
    frames = rng.reshape(4, 6, 5, 3)  # n=4, h=6, w=5 (odd width → padded)
    avi = M.encode_avi_rgb24(frames, rate=12, scale=1)
    w, h, rate, scale, got = M.decode_avi(avi)
    assert (w, h, rate, scale) == (5, 6, 12, 1)
    assert (got == frames).all()

    with pytest.raises(ValueError):  # not RIFF/AVI
        M.decode_avi(b"JUNK" + avi[4:])
    with pytest.raises(ValueError):  # container size field corrupted
        M.decode_avi(avi[:4] + struct.pack("<I", 5) + avi[8:])
    # compressed biCompression in strf must be rejected (no codec libs)
    bad = bytearray(avi)
    strf_at = avi.index(b"strf")
    bad[strf_at + 8 + 16:strf_at + 8 + 20] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError):
        M.decode_avi(bytes(bad))
    # frame-count mismatch between avih and movi must be caught
    avih_at = avi.index(b"avih")
    bad2 = bytearray(avi)
    bad2[avih_at + 8 + 16:avih_at + 8 + 20] = struct.pack("<I", 9)
    with pytest.raises(ValueError):
        M.decode_avi(bytes(bad2))


def test_avi_media_decode_matches_generator(spark, sf_dir):
    """documents_as_avi_media → decode_avi_frame_stats recovers the
    generator's closed form per FRAME through the full encode→RIFF-walk→
    DIB-decode path (one output row per frame, the explode shape)."""
    from opendataloader_pdf_spark.functions import multimodal as M
    from opendataloader_pdf_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    got = M.decode_avi_frame_stats(M.documents_as_avi_media(docs)).toPandas()
    dids = docs.select("doc_id").toPandas()["doc_id"].astype(int)
    assert len(got) == int(sum(1 + d % 5 for d in dids))
    for _, r in got.iterrows():
        did, fi = int(r["media_id"]), int(r["frame_idx"])
        w, h = 4 + did % 13, 4 + did % 11
        assert (r["width"], r["height"]) == (w, h)
        assert r["rate"] == 2 + did % 7
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        assert r["frame_sum"] == int(((did + 7 * fi + x + 3 * y + c * 5) % 256).sum())


def test_xy_cut_checkable_provable_order(spark, sf_dir):
    """The checkable XY-Cut entry's ranks equal the layout's provable
    reading order, recomputed here independently of both the operator
    and the DuckDB oracle: banner first (cross-layout merge), then
    left column top-to-bottom, then right (odd pages); pure
    top-to-bottom on even pages."""
    from opendataloader_pdf_spark.queries import QUERIES

    got = QUERIES["o2_xy_cut_checkable"].fn(spark, sf_dir).toPandas()
    assert len(got) == 144
    for page, grp in got.groupby("page"):
        ranks = grp.set_index("block_id")["reading_rank"].to_dict()
        if page % 2 == 1:
            # banner k=0, left col k=1,3,5,7 (bands top->bottom),
            # right col k=2,4,6,8
            expect = {0: 0, 1: 1, 3: 2, 5: 3, 7: 4, 2: 5, 4: 6, 6: 7, 8: 8}
        else:
            expect = {k: k for k in range(9)}
        assert ranks == expect, (page, ranks)


def test_wav_overrunning_chunk_refused_and_empty_wav_ok(spark):
    """Review follow-ups: (a) a data chunk declaring more bytes than
    remain must be refused (the AVI refusal contract, now shared);
    (b) a valid zero-frame WAV must decode and stat cleanly instead of
    crashing numpy's empty-max inside the Spark stage."""
    import struct

    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.functions import multimodal as M

    wav = M.encode_wav_pcm16(np.arange(20, dtype=np.int16), rate=8000,
                             channels=1)
    # inflate the data chunk's length field past the buffer end
    i = wav.rindex(b"data")
    (ln,) = struct.unpack("<I", wav[i + 4:i + 8])
    bad = wav[:i + 4] + struct.pack("<I", ln + 40) + wav[i + 8:]
    with _pytest.raises(ValueError, match="declares"):
        M.decode_wav(bad)

    empty = M.encode_wav_pcm16(np.array([], dtype=np.int16), rate=8000,
                               channels=1)
    ch, rate, nf, samples = M.decode_wav(empty)
    assert (ch, rate, nf, len(samples)) == (1, 8000, 0, 0)
    media = spark.createDataFrame([(1, bytearray(empty))],
                                  "media_id long, payload binary")
    row = M.decode_wav_stats(media).collect()[0]
    assert row["n_frames"] == 0 and row["amp_sum"] == 0
    assert row["amp_max"] == 0


def test_ddl_stream_preserves_malformed_null_op_rows(spark, tmp_path):
    """A null-op row must flow through replay_ddl_stream's ddl split to
    the engine's quarantine instead of being three-valued-logic-dropped."""
    from pyspark.sql import types as T

    from opendataloader_pdf_spark.cdc import ParquetMergeSink
    from opendataloader_pdf_spark.cdc.ddl import replay_ddl_stream

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("schema_version", T.IntegerType()),
        T.StructField("delivery_seq", T.LongType()),
        T.StructField("ddl", T.StringType()),
    ])
    ev = spark.createDataFrame([
        ("a", 1, "update", [1], 1, "s", 1, 1, None),
        ("b", 2, None, [2], 1, "s", 1, 2, None),     # malformed
        ("c", 3, "update", [3], 1, "s", 1, 3, None),
    ], schema)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    summary, timeline, n_premature = replay_ddl_stream(
        spark, sink, ev, batch_size=10, quarantine=True)
    assert summary.quarantined == 1
    assert sink.read().count() == 2


def test_engine_retention_deadletter_coexists_with_tail_epochs(spark,
                                                               tmp_path):
    """The engine's retention dead-letter must not clobber the tail's
    per-epoch batch=s<N> dirs: both write subdirs of the shared root."""
    import os

    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.cdc import (
        ParquetMergeSink,
        ReplayEngine,
        vacuum_tombstones,
    )

    ev = spark.range(0, 400).select(
        F.concat(F.lit("d"), (F.col("id") % 40).cast("string")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.when(F.col("id") % 7 == 3, F.lit("delete"))
        .otherwise(F.lit("update")).alias("op"),
        F.array((F.col("id") % 5).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"), F.lit("s").alias("source"),
        F.lit(1).cast("int").alias("schema_version"),
        F.current_timestamp().alias("ts"),
        F.col("id").alias("delivery_seq"),
    )
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), n_buckets=4)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(ev, batch_size=200)
    vacuum_tombstones(sink, floor=399)
    # simulate a tail epoch's dead letters already present
    pre = ev.filter(F.col("lsn") < 5)
    pre.write.parquet(os.path.join(sink.root, "_retention_expired",
                                   "batch=s0"))
    # engine replay of retransmitted sub-floor events must land in its
    # own batch=e<slot> dir, leaving the tail's copy intact
    retrans = ev.filter(F.col("lsn") % 89 == 0).withColumn(
        "delivery_seq", F.col("delivery_seq") + 1000)
    s = ReplayEngine(spark, sink).replay(retrans, batch_size=200)
    assert s.expired > 0
    root = os.path.join(sink.root, "_retention_expired")
    subdirs = sorted(d for d in os.listdir(root) if d.startswith("batch="))
    assert "batch=s0" in subdirs and any(d.startswith("batch=e")
                                         for d in subdirs)
    whole = spark.read.parquet(root)
    assert whole.count() == 5 + s.expired
