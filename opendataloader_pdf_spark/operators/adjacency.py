"""Adjacency / proximity operators — lag/lead linking, rank-k
cross-partition self-join, neighbor entity linking.

Reference parity:

* ``link_neighbors`` — checkNeighborLists / checkNeighborTables
  (core/processors/ListProcessor.java:403-522,
  core/processors/TableBorderProcessor.java:121-157; J4/J5): consecutive
  entities satisfying a continuation predicate get previous/next links.
* ``proximity_score`` — caption↔figure scoring
  (core/processors/CaptionProcessor.java:36-130; J2): score previous vs
  next neighbor, pick the better if above threshold.
* ``rank_k_repeats`` — header/footer detection
  (core/processors/HeaderFooterProcessor.java:142-199; J3): compare the
  object at rank k of partition p with rank k of partitions p+δ; rows
  that repeat across δ∈{1,2} are "furniture".

Scale notes: all three are single-window constructs (no self-join
materialization): rank-k repeats re-windows by (rank) ordered by the
partition axis so the δ-offset comparison is a lag/lead, which Catalyst
executes with one exchange on the rank key — vs a self-join that would
shuffle the table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def link_neighbors(
    df: DataFrame,
    partition: list[str],
    order: str,
    id_col: str,
    link_when: Column,
    prefix: str = "",
) -> DataFrame:
    """Add prev/next id links where ``link_when`` holds between a row and
    its predecessor. ``link_when`` may reference ``_prev_<col>`` columns
    for any column of df (provided via lag)."""
    w = Window.partitionBy(*partition).orderBy(order)
    out = df
    for c in df.columns:
        out = out.withColumn(f"_prev_{c}", F.lag(F.col(c)).over(w))
    linked = link_when & F.col(f"_prev_{id_col}").isNotNull()
    out = out.withColumn(f"{prefix}prev_id", F.when(linked, F.col(f"_prev_{id_col}")))
    # row i's next link exists iff row i+1 linked back to row i
    out = out.withColumn(
        f"{prefix}next_id",
        F.when(
            F.lead(F.col(f"{prefix}prev_id")).over(w) == F.col(id_col),
            F.lead(F.col(id_col)).over(w),
        ),
    )
    return out.drop(*[f"_prev_{c}" for c in df.columns])


def proximity_score(
    df: DataFrame,
    partition: list[str],
    order: str,
    score_prev: Column,
    score_next: Column,
    threshold: float,
    label_col: str = "linked",
) -> DataFrame:
    """Score each row against its previous and next neighbor; attach the
    winning direction ('prev'/'next') when the best score ≥ threshold.

    Null-safe on either score (lag/lead are null at partition
    boundaries): a missing neighbor can never be the winning direction —
    without the explicit null branches, ``score_prev >= null`` is SQL
    null and the when() would fall through to 'next' for a last row
    whose next neighbor does not exist."""
    best = F.greatest(score_prev, score_next)
    direction = (
        F.when(score_next.isNull(), F.lit("prev"))
        .when(score_prev.isNull(), F.lit("next"))
        .when(score_prev >= score_next, F.lit("prev"))
        .otherwise(F.lit("next"))
    )
    return df.withColumn(
        label_col, F.when(best >= threshold, direction)
    ).withColumn(f"{label_col}_score", F.round(best, 6))


def rank_k_repeats(
    df: DataFrame,
    axis: str,
    rank_col: str,
    value: str,
    deltas: tuple[int, ...] = (1, 2),
    repeat_col: str = "is_repeating",
) -> DataFrame:
    """Mark rows whose ``value`` at rank k of partition-axis position p
    equals the value at rank k of p+δ or p−δ for any δ (repeating
    furniture). Window over (rank) ordered by axis — no self-join."""
    w = Window.partitionBy(rank_col).orderBy(axis)
    cond = F.lit(False)
    for d in deltas:
        cond = cond | (F.lead(F.col(value), d).over(w) == F.col(value))
        cond = cond | (F.lag(F.col(value), d).over(w) == F.col(value))
    return df.withColumn(repeat_col, F.coalesce(cond, F.lit(False)))
