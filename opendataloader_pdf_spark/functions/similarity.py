"""Similarity search & near-duplicate detection over documents and
embedding vectors — the training-data-pipeline operator family.

* exact dedup           → operators.relational.dedup_exact (hash groupBy)
* n-gram Jaccard        → explode shingles → pair join → ratio (exact,
                          SQL-oracle-able)
* MinHash + LSH         → shingle → k minhashes via affine permutations of
                          xxhash64 values (JVM-side transform/array_min) →
                          band buckets → equi-join candidates → verify
* SimHash               → vectorized pandas UDF (numpy bit ops)
* cosine top-k (brute)  → broadcast queries × corpus, zip_with/aggregate
                          dot product (JVM-side), rank window
* cosine top-k (LSH)    → random-hyperplane sign buckets → candidates in
                          matching buckets only (the scale path)

Scale notes: every pair-generating join is an equi-join on a bucket key
(LSH band or hyperplane signature) — never a cartesian product. The
brute-force path exists as the correctness baseline and broadcasts the
query side. Signatures are computed with JVM built-ins where possible
(higher-order functions on arrays), pandas UDFs only for bit-packing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# fixed affine-permutation parameters. 31-bit Mersenne modulus keeps
# every product < 2^62 — no long overflow under Spark's ANSI mode.
_MERS = (1 << 31) - 1


def _perm_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [(int(rng.randint(1, _MERS - 1)), int(rng.randint(0, _MERS - 1))) for _ in range(k)]


# ---------------------------------------------------------------- shingles

def text_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text → array<string>.

    Formulated as zip_with over n shifted slices of the word array, NOT
    ``transform(idx, i -> array_join(slice(words, i, n)))``: in the
    transform form Catalyst inlines the whole regex+split pipeline into
    the per-element lambda, so normalization re-runs once per shingle —
    O(words²) per document (measured 8.9s → 0.9s for 5k docs). Here each
    shifted slice evaluates ``words`` a constant number of times per row
    and the lambdas touch only their element arguments.

    zip_with pads the shorter side with null and concat_ws skips nulls,
    which reproduces the short-document edge cases (<n words → one
    shingle of whatever exists) of the transform form exactly."""
    words = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    m = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    acc = F.slice(words, 1, m)
    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(words, i + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    # empty/whitespace-only text: split('') yields [''] and the fold
    # would emit a single "" shingle — which then matches every other
    # blank doc (and a blank eval row would flag every blank corpus doc
    # as contaminated). Blank text has ZERO shingles by contract.
    return F.filter(F.array_distinct(acc), lambda s: s != F.lit(""))


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """array<long> of xxhash64'd word n-gram shingles — the 8-byte wire
    form every shingle-keyed operator in this module shuffles/joins on
    (single definition: the hashing contract lives here)."""
    return F.transform(text_shingles(col, n), lambda s: F.xxhash64(s))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose n-gram
    shingle set overlaps ANY benchmark document's shingle pool by ≥
    ``threshold`` of the document's own shingles — the standard guard
    against eval data leaking into a training corpus.

    Returns (id, n_sh, n_hit, frac, contaminated) for EVERY corpus doc:
    a doc with null/empty text gets n_sh=0, frac=0.0, contaminated=false
    (explode_outer — shingle-less docs must not silently vanish from a
    keep/drop join downstream).

    Scale shape: the benchmark is the SMALL side (eval suites are
    thousands of docs vs a 100 TB corpus), so its distinct shingle-hash
    pool is broadcast and the corpus side is one narrow scan — explode →
    broadcast-hash semi-match → groupBy(id) count, all map-side
    combinable, no corpus shuffle by shingle. Overlap is measured
    against the POOLED benchmark shingle set (union of all benchmark
    docs), the conservative standard for decontamination — a doc
    stitched from several eval items still trips the threshold."""
    pool = (
        benchmark.select(
            F.explode(shingle_hashes(F.col(text_col), n)).alias("sh")
        ).distinct()
    )
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(shingle_hashes(F.col(text_col), n)).alias("sh"),
    )
    hits = sh.join(F.broadcast(pool.withColumn("_hit", F.lit(1))), "sh", "left")
    out = hits.groupBy("id").agg(
        F.sum(F.when(F.col("sh").isNotNull(), 1).otherwise(0)).alias("n_sh"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
    )
    raw = F.when(
        F.col("n_sh") > 0, F.col("n_hit") / F.col("n_sh")
    ).otherwise(F.lit(0.0))
    return out.select(
        "id", "n_sh", "n_hit",
        F.round(raw, 6).alias("frac"),
        (raw >= threshold).alias("contaminated"),
    )


# ------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.8, max_df: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle sets, pairs with
    similarity ≥ threshold. Shuffle key = shingle (co-groups only docs
    sharing a shingle — no cartesian).

    ``max_df`` (document-frequency cap) is the 100 TB guard: a shingle
    present in D documents contributes D·(D−1)/2 pairs to ONE reducer — a
    stopword-like shingle shared by 10⁵ docs means 10¹⁰ pairs in a single
    task. With max_df set, shingles with df > max_df are dropped from the
    ENTIRE computation (both the pair join and the per-doc set sizes), so
    the result is the exact Jaccard over the capped shingle sets — a
    well-defined, oracle-checkable semantics (high-df shingles carry no
    near-dup signal anyway; this is the standard stopword-df trick).

    Caching contract: the narrow (id, shingle) frame is cached because it
    feeds both self-join sides AND the size agg (without it the
    regex/split/shingle lineage recomputes per consumer, ~4× scan cost);
    the cache lives until the session drops it — long-lived sessions
    issuing many calls should spark.catalog.clearCache() between them.

    Shingles travel as 8-byte xxhash64 longs, not strings: every
    downstream shuffle (df agg, self-join) carries the hash only, ~3×
    narrower than the raw trigram text. Set identity is preserved —
    ``text_shingles`` already dedups per doc (array_distinct), so the
    exploded (id, hash) pairs are unique without a distinct() shuffle,
    and a 64-bit collision across a corpus' distinct shingles is
    negligible (birthday bound ~D²/2⁶⁵)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("sh"),
    ).cache()
    # df per shingle is a map-side-combinable agg over the CACHED frame
    # (one materialization feeds the df-agg, the size agg, and both join
    # sides)
    dfc = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        # the cap itself is a broadcast anti-join against the small hot set
        hot = dfc.filter(F.col("_df") > max_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # a df==1 shingle appears in exactly one doc and can't contribute a
    # pair, but in natural text MOST shingles are df==1 — dropping them
    # BEFORE the self-join shrinks the quadratic stage's input while
    # leaving `common` (and sizes, computed above) untouched. The
    # semi-join shuffles on sh, the same key as dfc's agg, so the
    # exchange is reused.
    pair_cond = F.col("_df") >= 2
    if max_df is not None:
        pair_cond = pair_cond & (F.col("_df") <= max_df)
    joinable = dfc.filter(pair_cond).select("sh")
    core = sh.join(joinable, "sh", "left_semi")
    a, b = core.alias("a"), core.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # NO broadcast hint on sizes: it has one row per corpus DOCUMENT —
    # forcing a broadcast would collect the whole corpus id set to the
    # driver at the billion-doc scale this function documents. AQE
    # broadcasts it automatically when it is actually small.
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# --------------------------------------------------------- MinHash + LSH

def minhash_signature(shingles: Column, k: int = 32, seed: int = 42) -> Column:
    """k-permutation MinHash signature (array<long>) over a string-shingle
    array. JVM-side: xxhash64 each shingle, then array_min of each affine
    permutation — no Python."""
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERS)))
    sigs = [
        F.array_min(F.transform(hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERS))))
        for a, b in _perm_params(k, seed)
    ]
    return F.array(*sigs)


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 32,
    seed: int = 42, hash_fn=None,
) -> DataFrame:
    """k-permutation MinHash signatures as a DataFrame (id, sig array<long>).

    Formulated as explode(shingles) → groupBy(id).agg(min(perm_j(h)) for
    each lane j): each shingle is hashed ONCE, each lane costs one
    multiply-add inside a map-side-combinable aggregate. The column-
    expression form (``minhash_signature``) inlines the whole shingle
    pipeline into every lane after projection collapse — k×bands copies of
    the expression tree, which blows past codegen limits and falls back to
    per-row interpretation (measured 269s vs <2s on 10k docs).

    ``hash_fn`` swaps the shingle hash (default xxhash64, the fast path;
    ``md5_hash60`` for the cross-engine oracle-checkable variant)."""
    hf = hash_fn or F.xxhash64
    h = docs.select(
        F.col(id_col).alias("id"),
        F.explode(text_shingles(F.col(text_col), n)).alias("_sh"),
    ).select("id", F.pmod(hf(F.col("_sh")), F.lit(_MERS)).alias("_h"))
    aggs = [
        F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(_MERS))).alias(f"_s{i}")
        for i, (a, b) in enumerate(_perm_params(k, seed))
    ]
    return (
        h.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"_s{i}") for i in range(k)]).alias("sig"))
    )


def md5_band_hash(lanes: Column) -> Column:
    """Band hash both engines compute identically: md5 of the lanes'
    comma-joined decimal rendering, first 15 hex chars as int64 (DuckDB
    twin: ``('0x' || substr(md5(concat_ws(',', ...)), 1, 15))::BIGINT``).
    Slower than xxhash64-over-array — the oracle-checkable choice."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(",", F.transform(lanes, lambda v: v.cast("string")))),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def _band_buckets(
    sig: DataFrame, k: int, bands: int, max_bucket: int | None,
    extra_cols: list[str] | None = None, band_hash_fn=None,
) -> DataFrame:
    """(id, sig) → exploded (id, band, bh) LSH bucket rows; optional
    bucket-size cap (degenerate-bucket reducer guard, see
    minhash_lsh_candidates). ``extra_cols`` are carried through the
    explode (narrow — no join-back needed). ``band_hash_fn`` swaps the
    band hash (default xxhash64 over the lane slice; ``md5_band_hash``
    for the oracle-checkable variant)."""
    extra = extra_cols or []
    bhf = band_hash_fn or F.xxhash64
    if k % bands:
        raise ValueError(
            f"bands={bands} does not divide k={k}: the trailing "
            f"{k % bands} signature lanes would be computed but never "
            f"hashed into any band, silently lowering recall below the "
            f"configured signature size"
        )
    rows_per_band = k // bands
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sig.select(
        "id",
        *extra,
        F.explode(
            F.transform(
                band_idx,
                lambda bi: F.struct(
                    bi.alias("band"),
                    bhf(F.slice("sig", bi * rows_per_band + 1, rows_per_band)).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("id", *extra, "b.band", "b.bh")
    if max_bucket is not None:
        w = Window.partitionBy("band", "bh")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    return banded


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int | None = None,
    hash_fn=None,
    band_hash_fn=None,
) -> DataFrame:
    """LSH banding: split the k-signature into ``bands`` rows-per-band
    groups, hash each band, explode to (band_idx, band_hash) buckets,
    equi-join within buckets → candidate pairs (id_a < id_b, distinct).

    The candidate join is an equi-join on (band_idx, band_hash): docs
    land in the same reducer only if a band collides — the LSH scale
    property that avoids all-pairs.

    ``max_bucket`` caps band-bucket size (the minhash analog of the
    shingle df-cap): a degenerate bucket of D docs — e.g. many identical
    boilerplate documents — squares to D·(D−1)/2 candidate pairs in one
    reducer. Buckets above the cap are dropped; pairs inside them almost
    always collide in another, smaller band too (that's why banding uses
    several bands), so recall loss is marginal while the worst reducer is
    bounded at max_bucket². Set it at 100 TB; leave None for exact parity.

    Caching contract: signatures are cached (both self-join sides read
    them); long-lived sessions should spark.catalog.clearCache() between
    unrelated calls."""
    sig = minhash_signatures(docs, id_col, text_col, n, k, seed,
                             hash_fn=hash_fn).cache()
    banded = _band_buckets(sig, k, bands, max_bucket,
                           band_hash_fn=band_hash_fn)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def verify_jaccard_pairs(
    docs: DataFrame, cands: DataFrame, id_col: str, text_col: str,
    n: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs ONLY — work is linear
    in |cands|, not quadratic in docs (the post-LSH verify step must never
    re-explode; at 100TB the candidate set is the small side). Each side's
    shingle set joins in once; the set ops run JVM-side
    (array_intersect/array_union)."""
    sh = docs.select(
        F.col(id_col).alias("_vid"),
        text_shingles(F.col(text_col), n).alias("_shset"),
    )
    out = (
        cands.join(sh.withColumnRenamed("_vid", "id_a").withColumnRenamed("_shset", "_sa"), "id_a")
        .join(sh.withColumnRenamed("_vid", "id_b").withColumnRenamed("_shset", "_sb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_dedup(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 32,
    bands: int = 8, jaccard_threshold: float = 0.8, seed: int = 42,
    max_bucket: int | None = None, hash_fn=None, band_hash_fn=None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify (per
    candidate pair, linear) → keep the min-id representative of each
    duplicate pair's loser set."""
    cands = minhash_lsh_candidates(docs, id_col, text_col, n, k, bands, seed,
                                   max_bucket=max_bucket, hash_fn=hash_fn,
                                   band_hash_fn=band_hash_fn)
    verified = verify_jaccard_pairs(
        docs, cands, id_col, text_col, n, jaccard_threshold
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def minhash_lsh_candidates_incremental(
    new_docs: DataFrame,
    index_sig: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int | None = None,
    hash_fn=None,
    band_hash_fn=None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental LSH dedup: candidates for a NEW document batch against
    a persisted signature index — the 100 TB ingest shape, where the
    corpus is never re-shingled.

    ``index_sig`` is a (id, sig array<long>) frame produced by
    ``minhash_signatures`` with the SAME (n, k, seed) — e.g. a parquet
    table appended to per batch. Returns ``(candidates, new_sig)``:
    candidate pairs where AT LEAST ONE side is new (new-vs-corpus and
    new-vs-new; corpus-vs-corpus pairs were already emitted when those
    docs were ingested), and the new batch's signatures for the caller
    to append to the index.

    Cost shape: shingle+sign the new batch only; the corpus contributes
    one scan of its (already computed) signatures into the band join.
    The band join stays an equi-join on (band, bh), and the
    at-least-one-new predicate lands as a cheap post-join filter on two
    boolean columns. ``max_bucket`` caps COMBINED bucket size, matching
    what a from-scratch run over corpus+batch would see.

    Caching contract (same as minhash_lsh_candidates): the new batch's
    signatures are cached — they feed BOTH self-join sides plus the
    returned frame the caller appends to the index; without the cache the
    shingle+k-lane aggregation would run 3x. Long-lived sessions should
    spark.catalog.clearCache() between unrelated calls."""
    new_sig = minhash_signatures(new_docs, id_col, text_col, n, k, seed,
                                 hash_fn=hash_fn).cache()
    tagged = index_sig.select("id", "sig", F.lit(False).alias("is_new")).unionByName(
        new_sig.select("id", "sig", F.lit(True).alias("is_new"))
    )
    banded = _band_buckets(tagged, k, bands, max_bucket, extra_cols=["is_new"],
                           band_hash_fn=band_hash_fn)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(F.col("a.is_new") | F.col("b.is_new"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return cands, new_sig


# --------------------------------------------------------------- SimHash

@pandas_udf(T.LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-row arrays of feature hashes — vectorized
    bit-vote: unpack bits of the whole batch's flat buffer at once."""
    lengths = np.fromiter((0 if a is None else len(a) for a in hashes), dtype=np.int64,
                          count=len(hashes))
    out = np.zeros(len(hashes), dtype=np.uint64)
    if lengths.sum():
        flat = np.concatenate(
            [np.asarray(a, dtype=np.uint64) for a in hashes if a is not None and len(a)]
        )
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = bits * 2 - 1  # +1 / -1 per bit
        row_ids = np.repeat(np.arange(len(lengths)), lengths)
        sums = np.zeros((len(lengths), 64), dtype=np.int64)
        np.add.at(sums, row_ids, votes)
        packed = (sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        out = packed.sum(axis=1, dtype=np.uint64)
    return pd.Series(out.astype(np.int64))


def md5_hash60(col: Column) -> Column:
    """60-bit feature hash both engines can compute identically: the
    first 15 hex chars of md5, parsed base-16 (DuckDB twin:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``). Slower than xxhash64
    but cross-engine deterministic — the oracle-checkable hash choice."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(col: Column, n: int = 3, hash_fn=None) -> Column:
    """SimHash of text: shingle → 64-bit feature hash (JVM; xxhash64 by
    default, ``hash_fn=md5_hash60`` for the oracle-mirrorable variant) →
    bit-vote pack (pandas UDF, the only Python step and it's
    batch-vectorized)."""
    hf = hash_fn or (lambda s: F.xxhash64(s))
    hashes = F.transform(text_shingles(col, n), hf)
    return _simhash_from_hashes(hashes)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ----------------------------------------------------------- cosine / ANN

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays — JVM higher-order functions
    (zip_with + aggregate), no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    query_id_col: str, k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the (small) query side,
    score all corpus rows JVM-side, rank window per query."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    ).crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_pairs_above(
    vecs: DataFrame, id_col: str, vec_col: str, threshold: float,
    exact_limit: int | None = 100_000, planes_per_band: int = 3,
    bands: int = 6, seed: int = 42,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold.

    Exact baseline: broadcast self-join with the id inequality as the
    join condition, so each pair is scored once; the dot product runs
    JVM-side (zip_with + aggregate, whole-stage codegen). The exact form
    is O(n²) comparisons — a scale-killer on a big corpus — so it is
    SIZE-GATED: above ``exact_limit`` rows the call auto-routes to
    ``cosine_pairs_lsh`` (hyperplane-bucketed candidates, exact cosine
    verify — every emitted pair truly passes the threshold; recall < 1
    for pairs whose signatures differ by >1 bit). ``exact_limit=None``
    disables the gate (tests / oracle parity)."""
    if exact_limit is not None:
        n = vecs.count()
        if n > exact_limit:
            dim_row = vecs.select(F.size(vec_col).alias("d")).first()
            return cosine_pairs_lsh(
                vecs, id_col, vec_col, threshold, dim=int(dim_row["d"]),
                planes_per_band=planes_per_band, bands=bands, seed=seed,
            )
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", cosine_sim(F.col("_va"), F.col("_vb")))
        .filter(F.col("_cos") >= threshold)  # filter raw, round for output (oracle parity)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def cosine_pairs_lsh(
    vecs: DataFrame, id_col: str, vec_col: str, threshold: float,
    dim: int, planes_per_band: int = 3, bands: int = 6, seed: int = 42,
) -> DataFrame:
    """Pairs with cosine >= threshold via banded hyperplane LSH — the
    100 TB path cosine_pairs_above gates into.

    OR-construction: ``bands`` independent short sign signatures of
    ``planes_per_band`` hyperplanes each; a pair becomes a candidate if
    ANY band's signature matches exactly (equi-join on (band, sig) — no
    cartesian; a band bucket co-groups only same-signature vectors).
    Candidates dedup on the pair key (they may collide in several bands),
    then exact-verify with the JVM-side cosine — emitted pairs ⊆ the
    exact result. Recall for a pair at angle θ: 1 − (1 − p^r)^b with
    p = 1 − θ/π, r = planes_per_band, b = bands (defaults: ~0.76 at
    cosine 0.4, →1 as cosine →1). Tune r up / b down for fewer, cleaner
    candidates at scale."""
    sigs = [
        lsh_signature(F.col(vec_col), dim, planes_per_band, seed + 1000 * bi)
        for bi in range(bands)
    ]
    banded = vecs.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"), s.alias("sig"))
            for bi, s in enumerate(sigs)
        ])).alias("_b"),
    ).select("_id", "_v", "_b.band", "_b.sig")
    a = banded.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                      "band", "sig")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                      "band", "sig")
    cands = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "_va", "id_b", "_vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("_cos", cosine_sim(F.col("_va"), F.col("_vb")))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane sign signature (long bitmask) — JVM-side dot
    products against literal plane arrays."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(F.zip_with(vec, p, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    query_id_col: str, dim: int, k: int = 10, n_planes: int = 12, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to matching hyperplane
    buckets (equi-join on signature), then exact cosine rank. The scale
    path — bucket join instead of all-pairs."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"),
                      lsh_signature(F.col(vec_col), dim, n_planes, seed).alias("_sig"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"),
                       lsh_signature(F.col(vec_col), dim, n_planes, seed).alias("_sig"))
    scored = c.join(F.broadcast(q), "_sig").withColumn(
        "cosine", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# ------------------------------------------------------------- IVF ANN

def _unit_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.maximum(n, 1e-300)


def _cell_probe_udf(centroids: np.ndarray, n: int):
    """Batched nearest-cell probe: one numpy matmul per Arrow batch
    (batch_rows x dim @ dim x K), argsort top-n — no K-times row
    expansion, no per-row Python. ``centroids`` must be unit rows."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        sims = V @ C.T
        # stable argsort on -sims: ties resolve to the LOWEST cell id
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(idx))

    return probe


@pandas_udf(T.DoubleType())
def _pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine of two fixed-dim float-array columns — batched
    einsum over the stacked Arrow buffers."""
    if not len(a):
        return pd.Series([], dtype=float)
    A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
    B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(np.where(den > 0, num / np.maximum(den, 1e-300), 0.0))


def ivf_centroids(
    vecs: DataFrame, id_col: str, vec_col: str, n_cells: int = 16
) -> DataFrame:
    """Deterministic IVF-flat coarse quantizer: the ``n_cells`` corpus
    vectors with the smallest ``xxhash64(id)`` serve as cell centroids
    (a hash-ordered sample — stable under repartitioning and unaffected
    by row order; the classic k-means refinement is an optional offline
    step that only moves centroids, not the algorithm shape). The
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-K then a K-row merge on the driver, no global sort."""
    sample = (
        vecs.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.xxhash64(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_cells)
    )
    w = Window.orderBy("cid")
    return sample.withColumn("cell", F.row_number().over(w) - 1).select("cell", "cvec")


def _centroid_matrix(centroids: DataFrame) -> np.ndarray:
    """Collect the K-row centroid table into a unit-row numpy matrix
    (K is tiny — this is the IVF coarse codebook, a driver-side
    constant shipped to executors inside the UDF closure)."""
    rows = centroids.orderBy("cell").collect()
    return _unit_rows(np.stack([np.asarray(r.cvec, dtype=np.float64) for r in rows]))


def ivf_assign(
    vecs: DataFrame, id_col: str, vec_col: str, centroids: DataFrame,
    out_id: str = "id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine): one
    Arrow-batched matmul per batch via ``_cell_probe_udf`` — the frame
    never expands by K and nothing shuffles (narrow map stage). Cosine
    ranking is norm-invariant in the vector, so only centroids are
    normalized."""
    probe = _cell_probe_udf(_centroid_matrix(centroids), 1)
    return vecs.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias("_v")
    ).withColumn("cell", F.element_at(probe("_v"), 1).cast("int"))


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    query_id_col: str, k: int = 10, n_cells: int = 16, nprobe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in coarse cells; each
    query probes its ``nprobe`` nearest cells and ranks exact cosine
    over only those cells members. Candidate work per query is
    ~(nprobe/n_cells) of the corpus instead of all of it, and the
    candidate join is a broadcast equi-join on the cell id — the IVF
    counterpart of the hyperplane-LSH bucket path (``lsh_topk``).

    All dense math is Arrow-batched numpy (assignment = one matmul per
    batch, pair scoring = one einsum per batch); the centroid codebook
    is collected once (K rows) and shipped in the UDF closures, so the
    centroid lineage never re-runs per consumer. Measured vs the
    JVM higher-order-function form at sf0.1: 4.3s -> see BENCH."""
    C = _centroid_matrix(ivf_centroids(corpus, id_col, vec_col, n_cells))
    if refine_iters:
        C = ivf_refine(corpus, vec_col, C, iters=refine_iters)
    assign1 = _cell_probe_udf(C, 1)
    ca = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    ).withColumn("cell", F.element_at(assign1("_v"), 1).cast("int"))
    probe_n = _cell_probe_udf(C, nprobe)
    qa = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_q")
    ).withColumn("cell", F.explode(probe_n("_q"))).withColumn(
        "cell", F.col("cell").cast("int")
    )
    scored = ca.join(F.broadcast(qa), "cell").withColumn(
        "cosine", F.round(_pair_cosine("_v", "_q"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_refine(
    vecs: DataFrame, vec_col: str, centroids: np.ndarray, iters: int = 2,
) -> np.ndarray:
    """Spherical k-means refinement of the IVF codebook: ``iters``
    Lloyd rounds of (assign to nearest centroid → per-cell mean →
    renormalize). Distributed in the textbook shape: each PARTITION
    emits only its K×dim partial sums + counts via ``mapInPandas``
    (one matmul + bincount per Arrow batch), the driver combines the
    tiny partials — full vectors are never shuffled, and per-iteration
    cost is one narrow pass over the corpus. Empty cells keep their
    previous centroid. Deterministic: no random init (seeded by the
    hash-sampled ``ivf_centroids``), float64 partial sums."""
    K, d = centroids.shape
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    v = vecs.select(F.col(vec_col).alias("_v"))
    schema = T.StructType([
        T.StructField("cell", T.IntegerType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("n", T.LongType()),
    ])
    for _ in range(iters):
        Cc = C  # bind current codebook into the closure

        def partials(batches, Cc=Cc):
            sums = np.zeros((K, d))
            cnt = np.zeros(K, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
                cell = np.argmax(V @ Cc.T, axis=1)
                np.add.at(sums, cell, V)
                cnt += np.bincount(cell, minlength=K)
            yield pd.DataFrame(
                {"cell": np.arange(K, dtype=np.int32), "s": list(sums), "n": cnt}
            )

        rows = v.mapInPandas(partials, schema).collect()
        sums = np.zeros((K, d))
        cnt = np.zeros(K, dtype=np.int64)
        for r in rows:
            sums[r.cell] += np.asarray(r.s)
            cnt[r.cell] += r.n
        newC = C.copy()
        nz = cnt > 0
        newC[nz] = _unit_rows(sums[nz] / cnt[nz, None])
        C = np.ascontiguousarray(newC)
    return C


def walsh_codebook(dim: int, n_cells: int) -> list[list[float]]:
    """Deterministic equal-norm IVF codebook for the checkable twin:
    cell j is the Walsh/Hadamard row with component i =
    (-1)^popcount(i & (j+1)) — pairwise-orthogonal ±1 vectors, all with
    norm sqrt(dim). Equal norms make argmax(dot) == argmax(cosine), so
    cell assignment needs no normalization, and the ±1 literals keep
    every multiply exact in IEEE doubles (only the fold order matters,
    which the DuckDB oracle replays operation-for-operation)."""
    return [
        [float(1 if bin(i & (j + 1)).count("1") % 2 == 0 else -1)
         for i in range(dim)]
        for j in range(n_cells)
    ]


def ivf_topk_jvm(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    query_id_col: str, codebook: list[list[float]], k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k with the SAME pipeline shape as ``ivf_topk`` (nearest-
    cell assignment → nprobe cell probe per query → candidates via cell
    equi-join with the broadcast query side → exact cosine rank) but
    with the coarse codebook FIXED as equal-norm literal rows and every
    float reduction a JVM ordered left-fold (zip_with + aggregate) —
    bit-reproducible by a declarative DuckDB twin, which is what makes
    the IVF family strict-oracle checkable (the numpy/matmul ``ivf_topk``
    stays the performance path; this twin value-checks the algorithm:
    assignment argmax + lowest-cell ties, probe ranking, candidate
    restriction, and final rank order)."""
    cells = [F.array(*[F.lit(x) for x in c]) for c in codebook]

    def dot(v: Column, p: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y),
            F.lit(0.0), lambda acc, t: acc + t,
        )

    def cell_sims(v: Column) -> Column:
        return F.array(*[dot(v, c) for c in cells])

    # corpus: nearest cell = first index of the max dot (lowest cell id
    # on ties — array_position returns the FIRST 1-based match)
    ca = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        cell_sims(F.col(vec_col)).alias("_sims"),
    ).select(
        "neighbor_id", "_cvec",
        (F.array_position("_sims", F.array_max("_sims")) - 1)
        .cast("int").alias("cell"),
    )
    # queries: nprobe nearest cells (dot desc, cell asc on ties)
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.posexplode(cell_sims(F.col(vec_col))).alias("cell", "_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    qa = (
        qs.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qvec", F.col("cell").cast("int").alias("cell"))
    )
    scored = ca.join(F.broadcast(qa), "cell").withColumn(
        "cosine", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def lsh_topk_banded(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    query_id_col: str, dim: int, k: int = 10, planes_per_band: int = 3,
    bands: int = 8, seed: int = 42,
) -> DataFrame:
    """High-recall approximate top-k via banded hyperplane LSH — the
    OR-construction counterpart of the single-signature ``lsh_topk``:
    ``bands`` independent short signatures of ``planes_per_band`` planes
    each; a corpus row becomes a candidate for a query if ANY band's
    signature matches (equi-join on (band, sig), dedupe on the pair
    key), then exact cosine ranks the survivors. Recall for a neighbor
    at angle θ is 1 − (1 − p^r)^b with p = 1 − θ/π — tunable toward 1
    without ever going all-pairs. Candidate volume stays bucket-bounded,
    so the shape survives 100 TB the same way cosine_pairs_lsh does."""
    def banded(df: DataFrame, idc: str, out: str, vout: str) -> DataFrame:
        sigs = [
            lsh_signature(F.col(vec_col), dim, planes_per_band,
                          seed + 1000 * bi)
            for bi in range(bands)
        ]
        return df.select(
            F.col(idc).alias(out), F.col(vec_col).alias(vout),
            F.explode(F.array(*[
                F.struct(F.lit(bi).alias("band"), s.alias("sig"))
                for bi, s in enumerate(sigs)
            ])).alias("_b"),
        ).select(out, vout, "_b.band", "_b.sig")

    c = banded(corpus, id_col, "neighbor_id", "_cvec")
    q = banded(queries, query_id_col, "query_id", "_qvec")
    cands = (
        c.join(F.broadcast(q), ["band", "sig"])
        .select("query_id", "neighbor_id", "_cvec", "_qvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine", F.round(cosine_sim(F.col("_cvec"), F.col("_qvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
