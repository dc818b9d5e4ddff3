"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Reference parity: image extraction/encoding sinks (ImagesUtils.write,
core/utils/ImagesUtils.java:48-60; Base64ImageUtils.java → SURVEY.md §2.1
K6) — generalized to the training-pipeline media path.

PNG payloads are decoded for REAL by a pure-stdlib codec (zlib + struct:
chunk walk with CRC verification, IDAT inflate, per-scanline unfilter for
all five PNG filter types) — no image library needed. WAV/PCM audio is
likewise decoded for REAL by a pure-stdlib RIFF codec (struct chunk walk
verifying the RIFF/WAVE magic and container size, fmt-chunk validation
rejecting non-PCM16 encodings, little-endian int16 frame decode); the
encoder is the stdlib ``wave`` writer. VIDEO is REAL for uncompressed
RIFF/AVI (the standard BI_RGB interchange format): ``encode_avi_rgb24``
emits a standards-compliant AVI — hdrl LIST with avih/strh/strf
(BITMAPINFOHEADER), movi LIST of '00db' DIB frames, idx1 index — and
``decode_avi`` walks it back with struct only, validating the container
size, stream type, biCompression=0/biBitCount=24, and decoding each
bottom-up 4-byte-row-padded BGR frame. Compressed codecs (H.264 etc.)
genuinely need codec libs the container lacks; those payloads fall back
to the deterministic hash-derived fake, keeping the identical Spark
plumbing — schema, Arrow batch shape, mapInPandas signature,
per-partition batching — exercised either way.

Scale notes: mapInPandas streams Arrow record batches — payloads never
materialize as Python row objects; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. At 100 TB, media payloads
ride binaryFile/parquet binary columns partitioned by content hash; the
decode stage is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def encode_png_gray(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder for 8-bit grayscale (h, w) uint8 arrays.

    Scanline filters rotate None/Sub/Up (types 0/1/2) so every decode of
    an encoded image exercises real unfiltering, not just the identity
    path. Emits IHDR + one IDAT + IEND with correct CRCs — readable by
    any standards-compliant viewer."""
    import struct
    import zlib

    h, w = arr.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y in range(h):
        line = arr[y].astype(np.int16)
        ft = y % 3
        if ft == 0:
            filt = line
        elif ft == 1:  # Sub: delta vs the previous pixel in the row
            filt = line.copy()
            filt[1:] -= line[:-1]
        else:  # Up: delta vs the same pixel one row up
            filt = line - prev
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = line

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering (all five types, RFC 2083 §6)."""
    stride = w * bpp
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub — running sum along the row (mod 256)
            if bpp == 1:
                line = np.cumsum(line, dtype=np.int64).astype(np.uint8)
            else:
                for i in range(bpp, stride):
                    line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            line = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} at row {y}")
        out[y] = line
        prev = line
    return out.reshape(-1)


def decode_png(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode a (non-interlaced, 8-bit) PNG with zlib + struct only.

    Returns (width, height, channels, bit_depth, flat uint8 pixels).
    Verifies every chunk CRC — a corrupted payload raises instead of
    yielding silent garbage stats."""
    import struct
    import zlib

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = channels = bit_depth = None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = bytes(data[pos + 4:pos + 8])
        payload = bytes(data[pos + 8:pos + 8 + ln])
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + payload) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (bit_depth={bit_depth}, "
                    f"interlace={interlace})"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG has no IHDR chunk")
    pixels = _unfilter(zlib.decompress(bytes(idat)), w, h, channels)
    return w, h, channels, bit_depth, pixels

def encode_wav_pcm16(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Encode interleaved int16 samples as a standards-compliant PCM WAV
    (RIFF/WAVE, fmt + data chunks) via the stdlib ``wave`` writer —
    playable by any audio tool."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PCM16 WAV with struct only — a real RIFF codec, not a
    library call: verifies the RIFF/WAVE magic and container size field,
    walks word-aligned chunks, validates the fmt chunk (rejecting
    compressed / non-16-bit encodings), and decodes the data chunk as
    little-endian int16 frames.

    Returns (n_channels, sample_rate, n_frames, flat int16 samples)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(
            f"RIFF size field {riff_size} != payload size {len(data) - 8}"
        )
    pos = 12
    fmt: tuple[int, int] | None = None
    frames: np.ndarray | None = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + ln > len(data):
            # same refusal contract as decode_avi: a chunk declaring
            # more bytes than remain is corruption, not short samples
            raise ValueError(
                f"WAV chunk {tag!r} declares {ln} bytes, only "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, ch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={audio_fmt}, bits={bits})"
                )
            fmt = (ch, rate)
        elif tag == b"data":
            frames = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    ch, rate = fmt
    if len(frames) % ch:
        raise ValueError("data chunk not a whole number of frames")
    return ch, rate, len(frames) // ch, frames


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("amp_sum", T.LongType(), True),
        T.StructField("amp_max", T.IntegerType(), True),
    ]
)


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """Real WAV decode → scalar sample statistics (strict-oracle shape:
    amp_sum/amp_max are wrong unless the RIFF walk, fmt validation, and
    int16 little-endian frame decode are all correct)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"].values,
                   "n_channels": [], "sample_rate": [], "n_frames": [],
                   "amp_sum": [], "amp_max": []}
            for p in pdf["payload"]:
                ch, rate, nf, samples = decode_wav(bytes(p))
                out["n_channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_frames"].append(nf)
                out["amp_sum"].append(int(samples.astype(np.int64).sum()))
                # a zero-frame WAV is valid; max() has no identity on an
                # empty array, so report 0 instead of crashing the stage
                out["amp_max"].append(int(samples.max()) if len(samples)
                                      else 0)
            yield pd.DataFrame(out).astype(
                {"n_channels": np.int32, "sample_rate": np.int32,
                 "n_frames": np.int32, "amp_sum": np.int64,
                 "amp_max": np.int32}
            )

    return media.mapInPandas(run, schema=WAV_STATS_SCHEMA)


def documents_as_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL PCM16 WAV payloads from the documents fixture:
    per doc a mono-or-stereo tone of 50 + doc_id % 211 frames at
    8000 + (doc_id % 5)·1000 Hz with flat sample j =
    (doc_id·31 + j·17) % 65536 − 32768 — closed-form so a SQL oracle can
    predict the decoded statistics exactly while the decode itself does
    full RIFF-walk / fmt-validation / int16-frame work."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"].astype(np.int64):
                did = int(did)
                n = 50 + did % 211
                rate = 8000 + (did % 5) * 1000
                ch = 1 + did % 2
                j = np.arange(n * ch, dtype=np.int64)
                samples = ((did * 31 + j * 17) % 65536 - 32768).astype(np.int16)
                payloads.append(encode_wav_pcm16(samples, rate, ch))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(np.int64).values,
                 "kind": "audio", "payload": payloads, "meta": None}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        build, schema=MEDIA_SCHEMA
    )


def encode_avi_rgb24(frames: np.ndarray, rate: int, scale: int = 1) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a standards-compliant
    uncompressed AVI (RIFF 'AVI ': hdrl LIST with avih/strh/strf, movi
    LIST of '00db' DIB frames, idx1 index) — playable by any video tool.
    DIB frames are stored per spec: BGR byte order, bottom-up rows,
    each row padded to a 4-byte boundary. fps = rate / scale."""
    import struct

    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def dib(frame: np.ndarray) -> bytes:
        # RGB → BGR, bottom-up, zero-padded rows
        bgr = frame[::-1, :, ::-1]
        row = np.zeros((h, stride), dtype=np.uint8)
        row[:, : w * 3] = bgr.reshape(h, w * 3)
        return row.tobytes()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (tag + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 * scale // rate,  # dwMicroSecPerFrame
        frame_bytes * rate // scale,  # dwMaxBytesPerSec
        0, 0x10,  # padding granularity, AVIF_HASINDEX
        n, 0, 1, frame_bytes,  # frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0,
        scale, rate, 0, n, frame_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00db", dib(f)) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the 'movi' kind tag
    idx = b"".join(
        struct.pack("<4sIII", b"00db", 0x10,
                    4 + i * (8 + frame_bytes), frame_bytes)
        for i in range(n)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode an uncompressed RIFF/AVI with struct only — a real
    container codec, not a library call: verifies the RIFF/'AVI ' magic
    and container size field, walks the hdrl LIST (avih dimensions, strh
    'vids' stream with rate/scale, strf BITMAPINFOHEADER rejecting
    compressed / non-24-bit encodings), then decodes every '00db' movi
    frame from bottom-up 4-byte-padded BGR DIB rows back to RGB.

    Returns (width, height, rate, scale, frames (n, h, w, 3) uint8)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(
            f"RIFF size field {riff_size} != payload size {len(data) - 8}"
        )

    def need(buf: bytes, n: int, what: str) -> bytes:
        if len(buf) < n:
            raise ValueError(f"truncated {what}: {len(buf)} < {n} bytes")
        return buf

    def walk(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            if pos + 8 + ln > len(buf):
                raise ValueError(
                    f"chunk {tag!r} declares {ln} bytes, only "
                    f"{len(buf) - pos - 8} remain"
                )
            body = buf[pos + 8:pos + 8 + ln]
            if tag == b"LIST":
                yield need(body, 4, "LIST type")[:4], body[4:]
            else:
                yield tag, body
            pos += 8 + ln + (ln & 1)

    w = h = n_frames = None
    rate = scale = None
    raw_frames: list[bytes] = []
    for tag, body in walk(data[12:]):
        if tag == b"hdrl":
            for t2, b2 in walk(body):
                if t2 == b"avih":
                    vals = struct.unpack("<14I", need(b2, 56, "avih")[:56])
                    n_frames, w, h = vals[4], vals[8], vals[9]
                elif t2 == b"strl":
                    for t3, b3 in walk(b2):
                        if t3 == b"strh":
                            fcc, _hdl = struct.unpack(
                                "<4s4s", need(b3, 28, "strh")[:8]
                            )
                            if fcc != b"vids":
                                raise ValueError(
                                    f"unsupported AVI stream {fcc!r}"
                                )
                            scale, rate = struct.unpack("<II", b3[20:28])
                        elif t3 == b"strf":
                            (_sz, bw, bh, _pl, bits, comp) = struct.unpack(
                                "<IiiHHI", need(b3, 20, "strf")[:20]
                            )
                            if comp != 0 or bits != 24:
                                raise ValueError(
                                    f"unsupported AVI (compression={comp}, "
                                    f"bits={bits}) — codec libs unavailable"
                                )
        elif tag == b"movi":
            for t2, b2 in walk(body):
                if t2 in (b"00db", b"00dc"):
                    raw_frames.append(b2)
    if w is None or rate is None:
        raise ValueError("AVI missing avih/strh header")
    if len(raw_frames) != n_frames:
        raise ValueError(
            f"movi has {len(raw_frames)} frames, header says {n_frames}"
        )
    stride = (w * 3 + 3) & ~3
    for i, rf in enumerate(raw_frames):  # validate BEFORE the (h,w)-sized alloc
        if len(rf) != stride * h:
            raise ValueError(f"frame {i}: {len(rf)} bytes != {stride * h}")
    out = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for i, rf in enumerate(raw_frames):
        rows = np.frombuffer(rf, dtype=np.uint8).reshape(h, stride)
        out[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return w, h, rate, scale, out


AVI_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("rate", T.IntegerType(), True),
        T.StructField("frame_sum", T.LongType(), True),
    ]
)


def decode_avi_frame_stats(media: DataFrame) -> DataFrame:
    """Real AVI decode → one row per FRAME with scalar pixel statistics
    (the video analog of frame sampling, row explosion inside
    mapInPandas; strict-oracle shape: frame_sum is wrong unless the RIFF
    walk, header validation, and bottom-up padded-BGR DIB decode are all
    correct)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [],
                   "height": [], "rate": [], "frame_sum": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, rate, _scale, frames = decode_avi(bytes(p))
                sums = frames.reshape(len(frames), -1).astype(np.int64).sum(axis=1)
                for i, s in enumerate(sums):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["rate"].append(rate)
                    out["frame_sum"].append(int(s))
            yield pd.DataFrame(out).astype(
                {"media_id": np.int64, "frame_idx": np.int32,
                 "width": np.int32, "height": np.int32,
                 "rate": np.int32, "frame_sum": np.int64}
            )

    return media.mapInPandas(run, schema=AVI_FRAME_STATS_SCHEMA)


def documents_as_avi_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL uncompressed AVI payloads from the documents
    fixture: per doc a clip of n = 1 + doc_id % 5 frames sized
    w = 4 + doc_id % 13 by h = 4 + doc_id % 11 at rate = 2 + doc_id % 7
    fps, with pixel channel value (doc_id + 7·frame + x + 3·y + 5·c)
    % 256 — closed-form so a SQL oracle can predict per-frame statistics
    exactly while the decode itself does the full RIFF/header/DIB work."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"].astype(np.int64):
                did = int(did)
                w = 4 + did % 13
                h = 4 + did % 11
                n = 1 + did % 5
                rate = 2 + did % 7
                f = np.arange(n, dtype=np.int64)[:, None, None, None]
                y = np.arange(h, dtype=np.int64)[None, :, None, None]
                x = np.arange(w, dtype=np.int64)[None, None, :, None]
                c = np.arange(3, dtype=np.int64)[None, None, None, :]
                arr = ((did + 7 * f + x + 3 * y + 5 * c) % 256).astype(np.uint8)
                payloads.append(encode_avi_rgb24(arr, rate))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(np.int64).values,
                 "kind": "video", "payload": payloads, "meta": None}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        build, schema=MEDIA_SCHEMA
    )


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # sidecar JSON
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts", T.DoubleType(), False),
        T.StructField("frame_hash", T.LongType(), False),
    ]
)


def _payload_hash(payloads: pd.Series) -> np.ndarray:
    """Deterministic 63-bit hash of binary payloads (vectorized-ish; the
    per-row cost is the unavoidable byte scan a real decoder does too)."""
    import zlib

    return np.fromiter(
        (zlib.crc32(b"" if p is None else bytes(p)) for p in payloads),
        dtype=np.int64,
        count=len(payloads),
    )


def _payload_hash_md5(payloads: pd.Series) -> np.ndarray:
    """60-bit md5-derived payload hash — the cross-engine deterministic
    variant (DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``),
    used where a SQL oracle must predict hash-derived metadata."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(b"" if p is None else bytes(p)).hexdigest()[:15], 16)
         for p in payloads),
        dtype=np.int64,
        count=len(payloads),
    )


def _fake_decode(pdf: pd.DataFrame, feat_dim: int) -> pd.DataFrame:
    h = _payload_hash(pdf["payload"])
    width = (64 + (h % 1920)).astype(np.int32)
    height = (64 + ((h >> 8) % 1080)).astype(np.int32)
    channels = np.where(pdf["kind"].values == "image", 3, 1).astype(np.int32)
    # deterministic pseudo-embedding from the hash
    ar = np.arange(feat_dim, dtype=np.float64)
    feats = np.sin((h[:, None] % 997) * 0.001 + ar * 0.1).astype(np.float32)
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].values,
            "width": width,
            "height": height,
            "channels": channels,
            "feature": list(feats),
        }
    )


def decode_images(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode + feature-extract media payloads.

    PNG payloads take the REAL decode path (stdlib ``decode_png``): true
    width/height/channels and a feature vector of the first ``feat_dim``
    pixels scaled to [0, 1]. Non-PNG payloads (opaque bytes, compressed
    codecs) get the deterministic hash-derived fake over the same Arrow
    plumbing; real WAV and uncompressed-AVI paths live in
    ``decode_wav_stats`` / ``decode_avi_frame_stats``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_png = pdf["payload"].map(
                lambda p: p is not None and bytes(p[:8]) == PNG_MAGIC
            )
            parts = []
            if is_png.any():
                png = pdf[is_png]
                rows = {"media_id": png["media_id"].values,
                        "width": [], "height": [], "channels": [],
                        "feature": []}
                for p in png["payload"]:
                    w, h, ch, _bd, px = decode_png(bytes(p))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(ch)
                    feat = (px[:feat_dim].astype(np.float32) / 255.0)
                    if len(feat) < feat_dim:
                        feat = np.pad(feat, (0, feat_dim - len(feat)))
                    rows["feature"].append(feat)
                parts.append(pd.DataFrame(rows).astype(
                    {"width": np.int32, "height": np.int32,
                     "channels": np.int32}
                ))
            if (~is_png).any():
                parts.append(_fake_decode(pdf[~is_png], feat_dim))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
    ]
)


def decode_png_stats(media: DataFrame) -> DataFrame:
    """Real PNG decode → scalar pixel statistics (strict-oracle shape:
    the pixel_sum is wrong unless chunk walk, inflate, and unfiltering
    are all correct)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"].values,
                   "width": [], "height": [], "channels": [],
                   "bit_depth": [], "pixel_sum": []}
            for p in pdf["payload"]:
                w, h, ch, bd, px = decode_png(bytes(p))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["bit_depth"].append(bd)
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(out).astype(
                {"width": np.int32, "height": np.int32,
                 "channels": np.int32, "bit_depth": np.int32,
                 "pixel_sum": np.int64}
            )

    return media.mapInPandas(run, schema=PNG_STATS_SCHEMA)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 8,
                  hasher: str = "crc32") -> DataFrame:
    """Frame sampling: one input row → N frame rows (row explosion inside
    mapInPandas, the video analog of explode). Frame count/timestamps are
    deterministic from the payload hash in the stub. ``hasher='md5'``
    selects the cross-engine-deterministic payload hash so a SQL oracle
    can predict every emitted row."""
    hash_fn = _payload_hash_md5 if hasher == "md5" else _payload_hash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = hash_fn(pdf["payload"])
            n_frames = (1 + (h % max_frames)).astype(np.int64)
            total = int(n_frames.sum())
            if total == 0:
                continue
            media_id = np.repeat(pdf["media_id"].values, n_frames)
            offs = np.concatenate(([0], np.cumsum(n_frames)))
            idx = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_frames)
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": idx.astype(np.int32),
                    "frame_ts": idx / fps,
                    "frame_hash": np.repeat(h, n_frames) ^ (idx * 2654435761),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def documents_as_png_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL PNG payloads from the documents fixture: for each
    doc a small grayscale gradient image with width = 4 + doc_id % 29,
    height = 4 + doc_id % 23, pixel(x, y) = (doc_id + x + 3y) % 256 —
    closed-form dimensions/content so a SQL oracle can predict the
    decoded statistics exactly while the decode itself does full chunk /
    CRC / inflate / unfilter work."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"].astype(np.int64):
                w = int(4 + did % 29)
                h = int(4 + did % 23)
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                arr = ((did + x[None, :] + 3 * y[:, None]) % 256).astype(np.uint8)
                payloads.append(encode_png_gray(arr))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(np.int64).values,
                 "kind": "image", "payload": payloads, "meta": None}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        build, schema=MEDIA_SCHEMA
    )


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: the text bytes act
    as an opaque binary payload (testdata has no real media files)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("video"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col(id_col))).alias("meta"),
    )
