"""Sessionization / segment aggregation — the reference's "merge runs of
adjacent rows" family as one declarative pattern.

Reference parity: adjacent-chunk merge (TextProcessor.mergeCloseTextChunks,
core/processors/TextProcessor.java:67-82, F7), chunks→lines
(TextLineProcessor.processTextLines, core/processors/TextLineProcessor.java:27-57,
A1), equal-run grouping (HeaderFooterProcessor.getEqualsItems,
core/processors/HeaderFooterProcessor.java:305-323, A16), Korean-form rows
(SpecialTableProcessor.java:22-88, A14).

Pattern (SURVEY.md §2.5): boundary flag via lag() → running sum = segment
id → groupBy(segment).agg(...). One shuffle for the window (by partition
key), one map-side-combinable agg. The window partitions by the entity key
(user/doc), so hot entities are bounded by per-entity event counts — for
truly unbounded single-key streams use the salted reduction in cdc.events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_segments(
    df: DataFrame,
    partition: list[str],
    order: str,
    new_segment_when: Column,
    segment_col: str = "segment",
) -> DataFrame:
    """Add a running segment id that increments whenever
    ``new_segment_when`` (a predicate usually built from lag()) is true.

    The first segment's id depends on the predicate's value at the
    partition's first row: a boundary predicate that is TRUE there
    (e.g. ``lag(..).isNull() | gap``) starts ids at 1, one that is
    FALSE (e.g. ``~eqNullSafe(lag(..), col)`` on a null-leading
    partition) starts at 0 — consumers must treat ids as ordinals
    WITHIN a partition, not compare them across partitions or assume a
    fixed first id."""
    flag = F.when(new_segment_when, 1).otherwise(0)
    run = Window.partitionBy(*partition).orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("_flag", flag).withColumn(
        segment_col, F.sum("_flag").over(run)
    ).drop("_flag")


def sessionize_by_gap(
    df: DataFrame,
    partition: list[str],
    ts: str,
    gap_seconds: int,
    segment_col: str = "session_id",
) -> DataFrame:
    """Classic gap sessionization: a new session starts when the time
    since the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(*partition).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    boundary = prev.isNull() | (
        F.col(ts).cast("long") - prev.cast("long") > gap_seconds
    )
    return assign_segments(df, partition, ts, boundary, segment_col)


def sessionize_on_change(
    df: DataFrame,
    partition: list[str],
    order: str,
    value: str,
    session_col: str = "run_id",
) -> DataFrame:
    """Equal-run grouping (A16): a new run starts whenever ``value``
    differs from the previous row's (null-safe)."""
    w = Window.partitionBy(*partition).orderBy(order)
    boundary = ~F.lag(F.col(value)).over(w).eqNullSafe(F.col(value))
    return assign_segments(df, partition, order, boundary, session_col)


def segment_aggregate(
    df: DataFrame,
    partition: list[str],
    segment_col: str,
    aggs: list[Column],
) -> DataFrame:
    """Collapse each segment to one row (the reference's run-merge)."""
    return df.groupBy(*partition, segment_col).agg(*aggs)
