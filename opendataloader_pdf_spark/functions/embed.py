"""Feature-hashing document embedder (the "hashing trick", Weinberger
et al. ICML'09): map each word to one of ``dim`` signed buckets by a
deterministic md5 hash and accumulate counts — a fixed-dimension dense
document vector with NO trained vocabulary, so the op is a pure function
of the text and embeds a 100 TB corpus with one explode + two
map-side-combinable aggregations (no model broadcast, no driver state).

Integer accumulators on purpose: the vector is exact, so the DuckDB
oracle twin hash-matches bit-for-bit, and downstream cosine math casts
to double only at the comparison boundary. The md5 bucket/sign rule is
engine-portable (same construction as functions/sampling.hash_bucket):

    bucket(w) = int(hex(md5(w))[0:4], 16) % dim
    sign(w)   = +1 if int(hex(md5(w))[4], 16) < 8 else -1

Reference analog: the reference derives fixed-width feature rows from
text chunks before classification (core/processors/TextProcessor.java);
here the features feed similarity search / semantic dedup instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opendataloader_pdf_spark.functions.lm import doc_words

__all__ = ["hash_bucket_sign", "feature_hash_embed"]


def hash_bucket_sign(word: Column, dim: int) -> tuple[Column, Column]:
    digest = F.md5(word)
    bucket = (F.conv(F.substring(digest, 1, 4), 16, 10).cast("int") % dim)
    sign = F.when(
        F.conv(F.substring(digest, 5, 1), 16, 10).cast("int") < 8, F.lit(1)
    ).otherwise(F.lit(-1))
    return bucket, sign


def feature_hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding: array<long>[dim]) — signed hashed bag-of-words.

    Plan: explode words → (id, bucket) partial-sum (map-side combine
    keyed by the doc id the corpus is already partitioned by) → per-doc
    map_from_entries → densify via a sequence(0, dim-1) transform. Two
    shuffles total, both keyed on the doc id; nothing is collected.
    """
    w = doc_words(df, id_col, text_col).select(
        F.col(id_col), F.explode("words").alias("w")
    )
    bucket, sign = hash_bucket_sign(F.col("w"), dim)
    agg = (
        w.select(F.col(id_col), bucket.alias("bucket"), sign.alias("sgn"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    dense = agg.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("v")))
        ).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("long")),
    )
    return dense.select(F.col(id_col), vec.alias(vec_col))
