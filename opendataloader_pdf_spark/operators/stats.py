"""Frequency / mode / rarity statistics and global style-level ranking.

Reference parity:

* ``mode_weight_stats`` — ModeWeightStatistics
  (core/utils/ModeWeightStatistics.java:26-74; A3): count-by-value,
  mode within a clamp range, and a rank-above-mode boost in [0,1]
  (rank of a value among distinct values above the mode, normalized).
* ``style_levels`` — HeadingProcessor.detectHeadingsLevels
  (core/processors/HeadingProcessor.java:104-122; A5): group by style
  columns, assign level 1..n by descending style order (dense_rank).

Scale notes: both are aggregate+window over the *distinct-value* domain
(tiny after the groupBy), so the expensive input is reduced map-side
before any window runs. Joined back to the fact rows via broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_frequencies(df: DataFrame, value: str, clamp: tuple[float, float] | None = None) -> DataFrame:
    """Count-by-value over an optional clamp range → (value, cnt)."""
    d = df
    if clamp is not None:
        d = d.filter((F.col(value) >= clamp[0]) & (F.col(value) <= clamp[1]))
    return d.groupBy(value).agg(F.count(F.lit(1)).alias("cnt"))


def mode_weight_stats(
    df: DataFrame,
    value: str,
    clamp: tuple[float, float] | None = None,
) -> DataFrame:
    """Per distinct value: frequency, the global mode (most frequent value,
    ties → smaller value), and a rarity boost in [0,1]: percent_rank of the
    value among distinct values strictly above the mode (0 for values at or
    below the mode). Output: (value, cnt, mode_value, boost)."""
    freq = value_frequencies(df, value, clamp)
    w_mode = Window.orderBy(F.desc("cnt"), F.asc(value))
    freq = freq.withColumn("_r", F.row_number().over(w_mode))
    mode_val = F.max(F.when(F.col("_r") == 1, F.col(value))).over(
        Window.partitionBy()
    )
    freq = freq.withColumn("mode_value", mode_val).drop("_r")
    above = F.col(value) > F.col("mode_value")
    w_above = Window.partitionBy(above.cast("int")).orderBy(value)
    boost = F.when(above, F.percent_rank().over(w_above)).otherwise(F.lit(0.0))
    return freq.withColumn("boost", F.round(boost, 6))


def style_levels(df: DataFrame, style_cols: list[Column | str],
                 level_col: str = "level",
                 ascending: bool = True) -> DataFrame:
    """Assign hierarchy level 1..n by global style order across the
    whole frame.

    ``style_cols`` are VALUE columns/expressions (not SortOrders);
    ``ascending`` picks the rank direction. The global dense_rank runs
    over the DISTINCT style-tuple domain (tiny: distinct styles, not
    rows) and the level joins back to the fact rows via broadcast —
    ranking the fact frame directly would funnel EVERY row through one
    no-partition window task (Spark warns 'No Partition Defined for
    Window operation')."""
    keys = [c if isinstance(c, Column) else F.col(c) for c in style_cols]
    named = [k.alias(f"_s{i}") for i, k in enumerate(keys)]
    domain = df.select(*named).distinct()
    order = [
        F.col(f"_s{i}") if ascending else F.col(f"_s{i}").desc()
        for i in range(len(keys))
    ]
    ranked = domain.withColumn(level_col, F.dense_rank().over(
        Window.orderBy(*order)))
    cond = None
    for i, k in enumerate(keys):
        c = k.eqNullSafe(F.col(f"_s{i}"))
        cond = c if cond is None else (cond & c)
    out = df.join(F.broadcast(ranked), on=cond, how="left")
    return out.drop(*[f"_s{i}" for i in range(len(keys))])
