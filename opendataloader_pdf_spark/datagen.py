"""Deterministic synthetic generator for the CDC engine's input tables.

Shapes come from FIXTURES.md:

* ``documents`` base table  — (doc_id string, tokens array<int>, n_tok int,
  source string)  [BASELINE.json input_hint]
* ``change_events`` stream — (lsn long, doc_id string, op string,
  tokens array<int>, n_tok int, source string, lang string nullable,
  schema_version int, ts timestamp, delivery_seq long)

Every column is a pure function of (seed, lsn) via a splitmix64-style hash,
so generation is deterministic under ANY partitioning — the property a
distributed generator must have (no RNG state shared across partitions).
The stream includes, per FIXTURES.md §2:

* zipf-ish hot keys  (~1% of docs receive ~30% of events),
* exact duplicate (doc_id, lsn) retransmissions,
* bounded out-of-order delivery (delivery_seq is a within-window
  permutation of lsn, so micro-batches cut on delivery order contain
  out-of-order lsns — the MERGE must be LSN-guarded),
* tombstones (op=delete) followed by re-inserts,
* a schema_version bump on the last 20% of the stream that introduces the
  additive nullable column ``lang`` (schema-evolution path).

Generation is Spark-distributed (``spark.range`` → ``mapInPandas`` with
numpy, Arrow-batched) so the same code scales to 10^10 events; tests use
small counts.

Reference analogs: the monotonic LSN mirrors the reference's per-document
content-id counter (StaticLayoutContainers.java:46-58); duplicates mirror
the overlapping-chunk dedup input (TextProcessor.java:84-105).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB = 50_257
SOURCES = np.array(["web", "books", "code", "wiki"])
LANGS = np.array(["en", "ko", "zh", "es"])
DISORDER_WINDOW = 64  # bounded out-of-order delivery window
_PERM_K = 37  # coprime with DISORDER_WINDOW → bijection within window

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("delivery_seq", T.LongType(), False),
        # partial-update (token-splice) payload — null unless op='patch'
        T.StructField("patch_start", T.IntegerType(), True),
        T.StructField("patch_del", T.IntegerType(), True),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)


_U64 = 0xFFFFFFFFFFFFFFFF


def _mix(x: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 hash of x, salted."""
    z = x.astype(np.uint64) + np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & _U64)
    z = z + np.uint64((seed * 0xBF58476D1CE4E5B9) & _U64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _tokens_for(h: np.ndarray, max_tok: int) -> tuple[list[np.ndarray], np.ndarray]:
    """Vectorized variable-length token arrays: one concatenated arange,
    split by cumulative lengths (no per-row Python loop over values)."""
    lengths = (1 + (_mix(h, 7, 0) % np.uint64(max_tok))).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    total = int(offsets[-1])
    flat_idx = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), lengths
    )
    base = np.repeat(_mix(h, 11, 0), lengths)
    flat = ((base + flat_idx * np.uint64(2654435761)) % np.uint64(VOCAB)).astype(np.int32)
    arrays = np.split(flat, offsets[1:-1])
    return arrays, lengths.astype(np.int32)


def _event_frame(
    lsns: np.ndarray,
    n_events: int,
    n_docs: int,
    seed: int,
    max_tok: int,
    hot_frac: float,
    hot_share: float,
    patch_frac: float = 0.0,
) -> pd.DataFrame:
    """All event columns as pure functions of lsn (deterministic)."""
    h_doc = _mix(lsns, 1, seed)
    n_hot = max(1, int(n_docs * hot_frac))
    is_hot = (_mix(lsns, 2, seed) % np.uint64(1000)) < np.uint64(int(hot_share * 1000))
    doc_idx = np.where(
        is_hot,
        h_doc % np.uint64(n_hot),
        np.uint64(n_hot) + h_doc % np.uint64(max(1, n_docs - n_hot)),
    ).astype(np.int64)

    r_op = _mix(lsns, 3, seed) % np.uint64(100)
    op = np.where(r_op < 70, "update", np.where(r_op < 85, "insert", "delete"))
    # a fraction of updates become partial token splices (op='patch')
    is_patch = (r_op < 70) & (
        (_mix(lsns, 31, seed) % np.uint64(1000)) < np.uint64(int(patch_frac * 1000))
    )
    op = np.where(is_patch, "patch", op)
    patch_start = np.where(
        is_patch, (_mix(lsns, 32, seed) % np.uint64(max_tok)).astype(np.int64), -1
    ).astype(np.int32)
    patch_del = np.where(
        is_patch, (_mix(lsns, 33, seed) % np.uint64(8)).astype(np.int64), -1
    ).astype(np.int32)

    # payload derived from (doc, lsn) so updates actually change tokens
    h_payload = _mix(lsns + (doc_idx.astype(np.uint64) << np.uint64(20)), 5, seed)
    tokens, n_tok = _tokens_for(h_payload, max_tok)
    src = SOURCES[(_mix(lsns, 6, seed) % np.uint64(len(SOURCES))).astype(np.int64)]

    schema_version = np.where(lsns < np.uint64(int(n_events * 0.8)), 1, 2).astype(np.int32)
    lang = np.where(
        schema_version == 2,
        LANGS[(_mix(lsns, 8, seed) % np.uint64(len(LANGS))).astype(np.int64)],
        None,
    )

    lsn_i = lsns.astype(np.int64)
    ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.to_timedelta(lsn_i, unit="s")

    # bounded out-of-order delivery: bijective permutation within windows
    w = lsn_i // DISORDER_WINDOW
    pos = lsn_i % DISORDER_WINDOW
    delivery = w * DISORDER_WINDOW + (pos * _PERM_K) % DISORDER_WINDOW

    df = pd.DataFrame(
        {
            "lsn": lsn_i,
            "doc_id": pd.Series(doc_idx).map(lambda i: f"doc{i:08d}"),
            "op": op,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": src,
            "lang": lang,
            "schema_version": schema_version,
            "ts": ts,
            "delivery_seq": delivery,
            "patch_start": patch_start,
            "patch_del": patch_del,
        }
    )
    # tombstones carry no payload
    df.loc[df["op"] == "delete", ["tokens", "n_tok"]] = None
    # patches: tokens column holds the (short) insertion payload
    pm = df["op"] == "patch"
    if pm.any():
        df.loc[pm, "tokens"] = df.loc[pm, "tokens"].map(lambda a: a[:4])
        df.loc[pm, "n_tok"] = df.loc[pm, "tokens"].map(len)
    df.loc[~pm, ["patch_start", "patch_del"]] = None
    return df


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    max_tok: int = 64,
    dup_frac: float = 0.02,
    hot_frac: float = 0.01,
    hot_share: float = 0.30,
    patch_frac: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic CDC stream.

    Rows with id >= n_events are exact retransmissions of an earlier event
    (same (doc_id, lsn), same payload — the F2 dedup target); their
    delivery_seq is displaced so the duplicate can land in a later batch.
    """
    n_dups = int(n_events * dup_frac)
    total = n_events + n_dups

    def generate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            is_dup = ids >= n_events
            eff = np.where(
                is_dup,
                (_mix(ids.astype(np.uint64), 9, seed) % np.uint64(n_events)).astype(np.int64),
                ids,
            )
            out = _event_frame(
                eff.astype(np.uint64), n_events, n_docs, seed, max_tok,
                hot_frac, hot_share, patch_frac
            )
            # retransmissions arrive later than the original
            out.loc[is_dup, "delivery_seq"] = out.loc[is_dup, "delivery_seq"] + int(
                DISORDER_WINDOW * 2
            )
            yield out

    rng = spark.range(0, total, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(generate, schema=EVENT_SCHEMA)


def gen_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    max_tok: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic base table of pre-tokenized sequences (input_hint
    shape) with lsn = -1 (pre-stream state)."""

    def generate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            h = _mix(ids, 21, seed)
            tokens, n_tok = _tokens_for(h, max_tok)
            src = SOURCES[(_mix(ids, 22, seed) % np.uint64(len(SOURCES))).astype(np.int64)]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids.astype(np.int64)).map(lambda i: f"doc{i:08d}"),
                    "tokens": tokens,
                    "n_tok": n_tok,
                    "source": src,
                    "lsn": np.int64(-1),
                }
            )

    rng = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(generate, schema=DOCUMENT_SCHEMA)
