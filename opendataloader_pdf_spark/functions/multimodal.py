"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Reference parity: image extraction/encoding sinks (ImagesUtils.write,
core/utils/ImagesUtils.java:48-60; Base64ImageUtils.java → SURVEY.md §2.1
K6) — generalized to the training-pipeline media path.

The decode step is STUBBED (this container has no image/audio libs): when
Pillow is absent, ``decode_images`` produces a deterministic fake —
metadata derived from the payload hash — via ``_fake_decode``. The
Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas signature, per-partition batching, and the frame-sampling
row-explosion pattern are exactly what a real decoder plugs into.

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

try:  # real decoder if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

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
    """Decode + feature-extract media payloads. Real decode requires
    Pillow (NotImplementedError keeps the contract honest); otherwise the
    deterministic fake exercises the identical Spark plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:
                raise NotImplementedError(
                    "real Pillow decode path not implemented in this "
                    "container build — plug Image.open over pdf['payload'] here"
                )
            yield _fake_decode(pdf, feat_dim)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one input row → N frame rows (row explosion inside
    mapInPandas, the video analog of explode). Frame count/timestamps are
    deterministic from the payload hash in the stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = _payload_hash(pdf["payload"])
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
