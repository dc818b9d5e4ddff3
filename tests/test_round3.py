"""Round-3 regression tests for the ADVICE findings: rescale commit
records are batch_id-less metadata commits, rescale refuses a dangling
staged chain, and publish/abort reject the staged view + tampered
pointers."""

from __future__ import annotations

import os

import pytest

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    abort_staged,
    begin_staged,
    publish,
    rescale_buckets,
)
from opendataloader_pdf_spark.datagen import gen_change_events


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3")
    gen_change_events(spark, 4_000, 400, seed=31).write.mode(
        "overwrite"
    ).parquet(str(d / "ev"))
    return spark.read.parquet(str(d / "ev"))


def _mk(spark, tmp_path, name, n_buckets=8):
    sink = ParquetMergeSink(spark, str(tmp_path / name), n_buckets=n_buckets)
    ReplayEngine(spark, sink).bootstrap(None)
    return sink


def test_rescale_commit_record_is_batchless(spark, events, tmp_path):
    """A rescale is a metadata commit: its record must carry
    batch_id=None (like MoR compaction) so wap.abort never treats it as
    owning a replay batch's audit partition — while the manifest-level
    replay checkpoint (m['batch_id']) is preserved for resume."""
    sink = _mk(spark, tmp_path, "t1")
    ReplayEngine(spark, sink).replay(events, batch_size=1_000, max_batches=2)
    ckpt = sink.last_batch_id()
    rec = rescale_buckets(sink, 16)
    assert rec["batch_id"] is None
    assert sink.last_batch_id() == ckpt  # resume point untouched
    # and the audit partitions of published batches survive a later
    # staged-chain abort that includes no commits of its own
    audit_before = sink.read_audit().count()
    begin_staged(sink)
    abort_staged(sink)
    assert sink.read_audit().count() == audit_before


def test_rescale_refuses_dangling_stage(spark, events, tmp_path):
    """Staged and HEAD chains share the manifest-{sid} namespace; a
    rescale committed under a dangling STAGE would overwrite the staged
    chain's first manifest. It must refuse instead."""
    sink = _mk(spark, tmp_path, "t2")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_000, max_batches=1)
    with pytest.raises(ValueError, match="staged"):
        rescale_buckets(sink, 16)
    abort_staged(sink)
    rec = rescale_buckets(sink, 16)  # fine once the stage is gone
    assert rec["rescale"] == [8, 16]


def test_publish_and_abort_reject_staged_view(spark, events, tmp_path):
    """publish/abort must be called on the BASE sink; the staged view's
    _head_path resolves to STAGE, so accepting it would strand the
    staged manifests past HEAD forever."""
    sink = _mk(spark, tmp_path, "t3")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_000, max_batches=1)
    with pytest.raises(ValueError, match="staged view"):
        publish(staged)
    with pytest.raises(ValueError, match="staged view"):
        abort_staged(staged)
    # the base sink still works, and the guard changed nothing on disk
    publish(sink)
    assert sink.read().count() > 0


def test_publish_requires_stage_base(spark, events, tmp_path):
    """STAGE_BASE is the concurrent-writer witness; publish must refuse
    when it is missing rather than skip the HEAD-moved check."""
    sink = _mk(spark, tmp_path, "t4")
    staged = begin_staged(sink)
    ReplayEngine(spark, staged).replay(events, batch_size=1_000, max_batches=1)
    os.remove(os.path.join(sink.meta_dir, "STAGE_BASE"))
    with pytest.raises(ValueError, match="STAGE_BASE"):
        publish(sink)
    res = abort_staged(sink)  # abort still reclaims the chain
    assert res["aborted_snapshots"]


def test_pii_scrub_adversarial_formats(spark):
    """Scrub patterns against format variants they were NOT written for:
    plus-addressed emails, dotted/spaced/parenthesized phones, SSNs with
    spaces — plus benign strings that must survive untouched. Both
    engines render from the same PII_RULES list; this exercises the
    rules themselves beyond the oracle's self-injected block."""
    import duckdb

    from opendataloader_pdf_spark.functions.text import scrub_pii, scrub_pii_sql

    cases = [
        # (input, expected after scrub)
        ("mail john.doe+spam@sub.example.co.uk now",
         "mail <EMAIL> now"),
        ("x JOHN_DOE%99@EXAMPLE.IO y", "x <EMAIL> y"),
        ("call (555) 123-4567 today", "call <PHONE> today"),
        ("call 555.123.4567 today", "call <PHONE> today"),
        ("call 555 123 4567 today", "call <PHONE> today"),
        ("call +1 555-0123 today", "call <PHONE> today"),
        ("ssn 123-45-6789 on file", "ssn <SSN> on file"),
        ("ssn 123 45 6789 on file", "ssn <SSN> on file"),
        ("account id 987654321 ok", "account id <ID> ok"),
        # benign: short digit runs, versions, 8-digit ids stay
        ("version 1.2.3 build 42", "version 1.2.3 build 42"),
        ("id 12345678 is short", "id 12345678 is short"),
        ("pi is 3.1415", "pi is 3.1415"),
        ("meet at 12:30-13:45", "meet at 12:30-13:45"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["text"])
    from pyspark.sql import functions as F

    got = [r["out"] for r in
           df.select(scrub_pii(F.col("text")).alias("out")).collect()]
    assert got == [e for _, e in cases]

    # the SQL rendering of the SAME rules agrees case-by-case
    con = duckdb.connect()
    for s, e in cases:
        lit = "'" + s.replace("'", "''") + "'"
        (out,) = con.sql(f"select {scrub_pii_sql(lit)}").fetchone()
        assert out == e, (s, out, e)


def test_png_codec_roundtrip_all_filters():
    """encode→decode round-trips random images, and the decoder handles
    the two filter types the encoder never emits (Average, Paeth) via a
    hand-filtered PNG. Corrupted chunks must raise, not decode."""
    import struct
    import zlib

    import numpy as np

    from opendataloader_pdf_spark.functions.multimodal import (
        PNG_MAGIC,
        decode_png,
        encode_png_gray,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (4, 4), (23, 29), (26, 32), (7, 31)]:
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        wd, ht, ch, bd, px = decode_png(encode_png_gray(arr))
        assert (wd, ht, ch, bd) == (w, h, 1, 8)
        assert np.array_equal(px.reshape(h, w), arr)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    w, h = 5, 4
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        line = arr[y].astype(np.int64)
        ft = 3 if y % 2 == 0 else 4
        filt = np.zeros(w, dtype=np.int64)
        for i in range(w):
            a = int(line[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i >= 1 else 0
            if ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) % 256
        raw.append(ft)
        raw += filt.astype(np.uint8).tobytes()
        prev = line
    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    _, _, _, _, px = decode_png(png)
    assert np.array_equal(px.reshape(h, w), arr)

    bad = bytearray(png)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_decode_images_routes_png_payloads(spark):
    """decode_images dispatches PNG payloads to the real codec (true
    dimensions) while non-PNG payloads keep the deterministic fake."""
    from opendataloader_pdf_spark.functions.multimodal import (
        decode_images,
        documents_as_media,
        documents_as_png_media,
    )
    from opendataloader_pdf_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    real = decode_images(documents_as_png_media(docs)).toPandas()
    assert (real["width"] == 4 + real["media_id"] % 29).all()
    assert (real["height"] == 4 + real["media_id"] % 23).all()
    assert (real["channels"] == 1).all()
    fake = decode_images(documents_as_media(docs)).toPandas()
    assert len(fake) == len(real)  # text payloads still decode (fake path)
    assert (fake["width"] >= 64).all()


def test_abort_reclaims_dangling_stage_base(spark, tmp_path):
    """A crash between the STAGE_BASE and STAGE writes leaves a base
    file with no chain; abort cleans it up as a no-op."""
    sink = _mk(spark, tmp_path, "t5")
    base = os.path.join(sink.meta_dir, "STAGE_BASE")
    with open(sink._head_path()) as f:
        head = f.read().strip()
    with open(base, "w") as f:
        f.write(head)
    res = abort_staged(sink)
    assert res == {"aborted_snapshots": [], "deleted_files": 0}
    assert not os.path.exists(base)
    begin_staged(sink)  # and a fresh stage starts cleanly
    abort_staged(sink)
