"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the wrong tool at 100 TB: its assignment depends on
partition layout and sampler seed state, so re-runs, repartitions, or
corpus growth silently reshuffle documents across train/val/test —
leaking eval docs into training. Hash-splitting fixes the assignment to
a pure function of (salt, id): stable under reshuffle, append-only under
corpus growth (new docs get new assignments; old ones never move), and
embarrassingly parallel (a narrow projection — no shuffle, no state).

md5 is used instead of xxhash64 deliberately: both Spark and DuckDB
expose bit-identical md5 hex, which makes the assignment exactly
oracle-checkable (and portable to any engine a downstream consumer
uses). Cost is immaterial — one hash per row in a map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars of the digest


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in insertion
    order; the last bound is forced to 65536 so weights that don't sum
    exactly to 1.0 still cover every bucket."""
    total = sum(weights.values())
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bounds.append((name, int(round(cum * _BUCKETS))))
    bounds.append((names[-1], _BUCKETS))
    return bounds


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Bucket in [0, 65536) from the first 4 hex chars of
    md5(salt ':' id) — reproducible in DuckDB as
    ``('0x' || substr(md5(salt || ':' || id::VARCHAR), 1, 4))::INT``."""
    digest = F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(digest, 1, 4), 16, 10).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket. ``weights`` is an
    ordered {name: weight} mapping (e.g. {"train": .9, "val": .05,
    "test": .05}); ``salt`` versions the assignment — bump it to re-deal
    every row, keep it to guarantee no row ever changes split."""
    bkt = hash_bucket(F.col(id_col), salt)
    bounds = split_boundaries(weights)
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(bkt < F.lit(hi), F.lit(name)).otherwise(expr)
    # single chained CASE WHEN evaluates the bucket once per row (Catalyst
    # dedups the common subexpression inside one projection)
    return df.withColumn(split_col, expr)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    salt: str = "mix1",
) -> DataFrame:
    """Data mixing: keep each row with its source's target rate,
    deterministically — the op that turns raw per-source corpora into a
    training mixture (e.g. web 30%, books 100%).

    Same md5-bucket machinery as ``hash_split``: a row survives iff
    bucket < rate·65536 for its source, so the sample is a pure function
    of (salt, id) — reproducible across runs/engines, append-stable
    under corpus growth, and NESTED across rates (the 30% sample is a
    subset of the 50% sample under the same salt — deterministic
    mixture sweeps). Sources absent from ``rates`` are dropped
    (explicit mixture contract: unlisted ≠ rate 1.0).

    Plan shape: broadcast-free — the rate table rides a literal
    ``create_map`` expression evaluated JVM-side; the whole op is one
    narrow filter, no shuffle, no join."""
    pairs: list[Column] = []
    for src, rate in rates.items():
        pairs += [F.lit(src), F.lit(int(round(rate * _BUCKETS)))]
    thr = F.create_map(*pairs)[F.col(source_col)]
    return df.filter(hash_bucket(F.col(id_col), salt) < thr)


def stratified_sample_exact(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int,
    salt: str = "strat1",
    rank_col: str = "sample_rk",
) -> DataFrame:
    """EXACTLY k rows per stratum (vs ``mixture_sample``'s rate-based
    expected counts): rows are ordered inside each stratum by the full
    md5 digest of (salt, id) — a deterministic uniform permutation — and
    the first k are kept. Same guarantees as ``hash_split``: re-runs and
    repartitions reproduce the identical sample; growing the corpus can
    only swap members in/out by hash order, never by layout.

    Plan: one hash-partitioned exchange on the stratum key plus a
    row_number window. Per-stratum data must be rank-able, so a
    pathologically hot stratum sorts on one reducer; for such strata
    pre-filter with ``mixture_sample`` at a rate that bounds the
    stratum below executor memory (two-phase sample), then exact-k the
    survivors — k is exact either way because the pre-filter is a
    superset by construction.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
