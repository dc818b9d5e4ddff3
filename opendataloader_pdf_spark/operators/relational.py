"""Core relational transforms: dedup, LWW, anti/semi set ops, multi-key
sort ranks, existence pruning.

Reference parity (file:line cites are to /root/reference):

* ``dedup_last_writer``  — TextProcessor.removeSameTextChunks
  (core/processors/TextProcessor.java:84-105): drop rows with the same
  key, keeping the latest occurrence. SURVEY.md §2.2 F2.
* ``anti_matches`` — "remove X matching Y" filters
  (HeaderFooterProcessor.java:72-96). SURVEY.md §2.3 J7.
* ``union_compatible`` — artifacts ∪ struct content
  (TaggedDocumentProcessor.java:50-57). SURVEY.md §2.7.
* ``multikey_rank`` — geometric page sort comparator
  (DocumentProcessor.java:299-337). SURVEY.md §2.6 O1.
* ``existence_prune`` — getPagesWithPossibleTables
  (AbstractTableProcessor.java:90-123). SURVEY.md §2.4 A12.

Scale notes: dedup uses window-over-key only when a full ordering rule is
required; the keep-any variant is an aggregation (map-side combinable).
``existence_prune`` is the dynamic-partition-pruning pattern: a cheap
aggregate builds the qualifying-key set, then a broadcastable semi-join
prunes the expensive work — at 100 TB the semi-join side is tiny and
Catalyst broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_writer(df: DataFrame, keys: list[str], order: str) -> DataFrame:
    """Keep exactly one row per key — the one with the highest ``order``
    value (last writer wins). Deterministic for a total order column."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def dedup_exact(df: DataFrame, keys: list[str], keep_min: str) -> DataFrame:
    """Exact duplicate elimination by key columns, keeping the row with
    the minimum ``keep_min`` (canonical representative). Aggregation form
    → map-side partial combine, no skew straggler."""
    others = [c for c in df.columns if c not in keys]
    return (
        df.groupBy(*keys)
        .agg(F.min_by(F.struct(*others), F.col(keep_min)).alias("_r"))
        .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in others])
    )


def anti_matches(df: DataFrame, matches: DataFrame, on: list[str]) -> DataFrame:
    """Remove rows whose key appears in ``matches`` (left anti join)."""
    return df.join(matches.select(*on).distinct(), on=on, how="left_anti")


def semi_matches(df: DataFrame, matches: DataFrame, on: list[str]) -> DataFrame:
    return df.join(matches.select(*on).distinct(), on=on, how="left_semi")


def union_compatible(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union by column name, tolerating additive schema drift."""
    return a.unionByName(b, allowMissingColumns=True)


def multikey_rank(df: DataFrame, order_cols: list[Column], partition: list[str] | None = None,
                  rank_col: str = "rank") -> DataFrame:
    """Materialize a multi-key sort as an explicit rank column (Spark rows
    are unordered; order must live in data — SURVEY.md §1.4)."""
    w = Window.partitionBy(*(partition or [])).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))


def existence_prune(df: DataFrame, group: str, flag: Column) -> DataFrame:
    """Keep only groups where ``flag`` holds for at least one row:
    cheap existence pre-aggregation → semi-join (work pruning)."""
    qualifying = df.groupBy(group).agg(F.max(flag.cast("int")).alias("_q")).filter(
        F.col("_q") == 1
    )
    return df.join(F.broadcast(qualifying.select(group)), on=group, how="left_semi")
