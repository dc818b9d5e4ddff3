"""Vectorized token-array operations over ``array<int32>`` columns.

Per BASELINE.json input_hint, ALL token-array manipulation goes through
pandas/Arrow UDFs — never per-row Python. Each UDF below receives a
pandas.Series of numpy int32 arrays per Arrow batch and works on the
concatenated flat buffer (segmented numpy ops over the whole batch, no
per-row Python loops).

Cheap structural ops (length, slice, concat, shingles) use Spark
built-ins instead — they're JVM-side and stay in whole-stage codegen;
the UDFs here are the genuinely numeric ones a training pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# two 31-bit Mersenne moduli → 62-bit combined fingerprint, all math
# stays < 2^47 so plain int64 numpy vectorizes it safely
_P1, _P2 = (1 << 31) - 1, (1 << 29) - 3
_B1, _B2 = 1_000_003, 999_983
_MAXLEN = 4096


def _flat(series: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a Series of arrays into (flat_values, lengths)."""
    lengths = np.fromiter(
        (0 if a is None else len(a) for a in series), dtype=np.int64, count=len(series)
    )
    if lengths.sum() == 0:
        return np.empty(0, dtype=np.int64), lengths
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in series if a is not None and len(a)]
    )
    return flat, lengths


def _pow_table(base: int, mod: int, n: int) -> np.ndarray:
    t = np.empty(n, dtype=np.int64)
    t[0] = 1
    for i in range(1, n):
        t[i] = (t[i - 1] * base) % mod
    return t


_POW1 = _pow_table(_B1, _P1, _MAXLEN)
_POW2 = _pow_table(_B2, _P2, _MAXLEN)


def _segmented_poly_hash(flat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """h(row) = sum(v_i * B^(L-1-i)) mod p, for two (B,p) pairs, combined.
    Fully vectorized: exponent per element + power-table gather +
    reduceat per segment."""
    n = len(lengths)
    if not len(flat):
        return np.zeros(n, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    idx_in_row = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    exp = np.repeat(lengths, lengths) - 1 - idx_in_row
    exp = np.minimum(exp, _MAXLEN - 1)  # rows longer than table wrap (still deterministic)
    t1 = (flat * _POW1[exp]) % _P1
    t2 = (flat * _POW2[exp]) % _P2
    nz = lengths > 0
    starts = offsets[:-1][nz]
    h1 = np.zeros(n, dtype=np.int64)
    h2 = np.zeros(n, dtype=np.int64)
    h1[nz] = np.add.reduceat(t1, starts) % _P1
    h2[nz] = np.add.reduceat(t2, starts) % _P2
    return h1 * (1 << 31) + h2


@pandas_udf(T.LongType())
def token_fingerprint(tokens: pd.Series) -> pd.Series:
    """62-bit polynomial fingerprint of the token array (document
    fingerprinting for token payloads; deterministic)."""
    flat, lengths = _flat(tokens)
    return pd.Series(_segmented_poly_hash(flat, lengths))


@pandas_udf(T.LongType())
def token_sum(tokens: pd.Series) -> pd.Series:
    """Sum of token ids — segmented reduction over the flat buffer."""
    flat, lengths = _flat(tokens)
    n = len(lengths)
    out = np.zeros(n, dtype=np.int64)
    if len(flat):
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        nz = lengths > 0
        out[nz] = np.add.reduceat(flat, offsets[:-1][nz])
    return pd.Series(out)


@pandas_udf(T.IntegerType())
def token_distinct_count(tokens: pd.Series) -> pd.Series:
    """Distinct token count per row — one global sort over
    (row_id << 32 | token) keys, then segment-boundary counting."""
    flat, lengths = _flat(tokens)
    if not len(flat):
        return pd.Series(np.zeros(len(lengths), dtype=np.int32))
    row_ids = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    # mask to unsigned 32-bit: a NEGATIVE int32 token id sign-extends to
    # 64 bits and its high bits clobber the row id, merging tokens
    # across rows in the same Arrow batch
    key = (row_ids << 32) | (flat.astype(np.int64) & 0xFFFFFFFF)
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    first = np.concatenate(([True], np.diff(sorted_key) != 0))
    uniq_rows = row_ids[order][first]
    counts = np.bincount(uniq_rows, minlength=len(lengths)).astype(np.int32)
    return pd.Series(counts)


def splice_tokens(tokens: Column, start: Column, delete_count: Column,
                  insert: Column) -> Column:
    """Token-array splice: delete ``delete_count`` elements at 0-based
    ``start``, insert array ``insert`` there. Pure built-ins (slice +
    concat) — JVM-side, no UDF. The CDC update path uses this for
    partial token rewrites."""
    head = F.slice(tokens, F.lit(1), start)
    tail_start = (start + delete_count + F.lit(1)).cast("int")
    tail_len = F.greatest(F.size(tokens) - start - delete_count, F.lit(0))
    tail = F.slice(tokens, tail_start, tail_len)
    return F.concat(head, insert, tail)


def ngram_shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-gram shingle hashes, JVM-side: transform over the index
    range, xxhash64 of each n-slice. Returns array<long>."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0)))
    return F.when(F.size(tokens) >= n, F.transform(idx, lambda i: F.xxhash64(F.slice(tokens, i, n)))).otherwise(
        F.array(F.xxhash64(tokens))
    )
