"""Statistical language-model scoring and lexical retrieval over the
documents corpus — the CCNet-style quality-filter half of a training-data
pipeline (reference analog: the expensive per-chunk scoring pass of
core/processors/TextProcessor.java generalized to corpus-level models).

Two families:

* ``bigram_lm`` / ``lm_score`` — build an add-alpha-smoothed bigram LM
  from the corpus itself (top-K bigrams/unigrams only, so the model
  BROADCASTS at any corpus size; everything below the cap backs off to
  the smoothing floor), then score every document's per-bigram
  cross-entropy against it. Documents far from the corpus distribution
  (boilerplate, gibberish, wrong language) score high and are dropped —
  the CCNet/KenLM perplexity-filter pattern, exactly SQL-expressible.

* ``bm25`` — Okapi BM25 retrieval of the top-k documents for a bag of
  query terms: inverted-index shape (term df → idf, per-doc tf), the
  standard lexical-search scoring. The query side is a literal array —
  broadcast by construction; the only shuffle is the per-(doc,term)
  count aggregation.

All expressions are JVM-side (split/explode/agg/join — no Python in the
hot path). Floats are rounded to 6 decimals at the boundary so the
DuckDB oracle twin hash-matches despite summation-order drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from opendataloader_pdf_spark.functions.text import normalize_ws

__all__ = ["doc_words", "doc_bigrams", "bigram_lm", "lm_score", "bm25"]


def doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, words array) — lowercase, whitespace-normalized split."""
    return df.select(
        F.col(id_col),
        F.split(normalize_ws(F.lower(F.col(text_col))), " ").alias("words"),
    )


def _bigram_array(words: Column) -> Column:
    # zip each word with its successor; guarded so 0/1-word docs yield []
    # instead of a negative-length slice
    n = F.size(words)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bigram) — one row per bigram OCCURRENCE (duplicates kept:
    the LM scores every position, not the distinct set)."""
    w = doc_words(df, id_col, text_col)
    return w.select(
        F.col(id_col), F.explode(_bigram_array(F.col("words"))).alias("bigram")
    )


def bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k_bigrams: int = 2000,
    top_k_unigrams: int = 2000,
) -> tuple[DataFrame, DataFrame, int]:
    """Corpus bigram LM, capped to the top-K entries by count (ties
    broken on the token string so the cap is deterministic and the
    DuckDB twin reproduces it bit-for-bit).

    The cap is the scale contract: a 100 TB corpus has billions of
    distinct bigrams, but the model that matters for filtering is the
    head of the distribution — capping makes both tables broadcastable
    constants while everything below the cap backs off to the smoothing
    floor. Returns (bigram_counts, unigram_counts, vocab_size); the
    counts are map-side-combinable aggregations (one shuffle each).
    """
    words = doc_words(df, id_col, text_col)
    uni = (
        words.select(F.explode("words").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.count()
    uni_top = (
        uni.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("c1"), F.asc("w"))
            ),
        )
        .filter(F.col("rk") <= top_k_unigrams)
        .drop("rk")
    )
    bi = (
        words.select(F.explode(_bigram_array(F.col("words"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    bi_top = (
        bi.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("c12"), F.asc("bigram"))
            ),
        )
        .filter(F.col("rk") <= top_k_bigrams)
        .drop("rk")
    )
    return bi_top, uni_top, vocab


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k_bigrams: int = 2000,
    top_k_unigrams: int = 2000,
    alpha: float = 0.5,
    keep_below: float = 10.0,
) -> DataFrame:
    """Per-document cross-entropy under the corpus bigram LM:

        H(doc) = -avg over bigram positions of
                 ln( (c12 + alpha) / (c1 + alpha * V) )

    c12/c1 are 0 below the top-K cap (add-alpha backoff). Output:
    (id, n_bigrams, cross_entropy rounded to 6, keep flag). Plan shape:
    two broadcast left joins (the capped LM) over the exploded bigram
    stream, then one map-side-combinable per-doc aggregation — no
    skew-prone shuffle joins at any corpus size.
    """
    bi_top, uni_top, vocab = bigram_lm(
        df, id_col, text_col, top_k_bigrams, top_k_unigrams
    )
    occ = doc_bigrams(df, id_col, text_col).withColumn(
        "w1", F.split(F.col("bigram"), " ").getItem(0)
    )
    scored = (
        occ.join(F.broadcast(bi_top), "bigram", "left")
        .join(F.broadcast(uni_top.withColumnRenamed("w", "w1")), "w1", "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * vocab))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(-F.avg("lp"), 6).alias("cross_entropy"),
    )
    # EVERY input doc gets a row: a doc with <2 words (or null text)
    # produces no bigram via explode and would otherwise vanish from
    # the output entirely — neither scored nor flagged — so a
    # downstream keep-join would silently lose it. Unscorable docs get
    # n_bigrams=0, null entropy, keep=false (no evidence → the filter's
    # conservative drop; such docs fail any length gate anyway).
    base = df.select(F.col(id_col)).distinct()
    return base.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("cross_entropy"),
        F.coalesce(F.col("cross_entropy") < F.lit(keep_below),
                   F.lit(False)).alias("keep"),
    )


def bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for one bag-of-terms query.

        score(d) = sum over query terms t of
                   idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
        idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )

    Inverted-index shape: per-(doc, term) tf is one map-side-combinable
    aggregation over the exploded term stream filtered to the (literal,
    broadcast-by-construction) query terms; df/avgdl/N are tiny exact
    aggregates. Output (doc_id, score, rk), rk deterministic via the
    (rounded score desc, id asc) order. At 100 TB the only wide exchange
    is the tf aggregation keyed by (doc, term) — uniform by
    construction, since each doc contributes at most |query| keys.
    """
    # cache: the split/normalize lineage otherwise recomputes for the
    # count, the avgdl aggregate, the tf aggregate, and the stats join
    # (4 corpus scans); same session-lifetime cache contract as
    # ngram_jaccard_pairs
    words = doc_words(df, id_col, text_col).cache()
    n_docs = words.count()
    stats = words.select(
        F.size("words").alias("dl"), F.col(id_col)
    )
    avgdl = stats.agg(F.avg("dl")).first()[0]
    if not n_docs or avgdl is None:
        # empty corpus / all-null text: a well-typed empty result, not
        # a float(None) TypeError
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, score double, rk long"
        )
    terms = [t.lower() for t in query_terms]
    tf = (
        words.select(F.col(id_col), F.explode("words").alias("t"))
        .filter(F.col("t").isin(terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = (
        tf.join(F.broadcast(dfreq), "t")
        .join(stats, id_col)
        .select(
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(F.round(F.sum("c"), 6).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
