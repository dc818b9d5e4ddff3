"""Spatial / interval containment join via grid-bucket pre-join.

Reference parity: TableBorderProcessor.addContentToTableBorder
(core/processors/TableBorderProcessor.java:53-89,159-170; J1) routes each
content object into the table-grid cell whose bbox contains it. The
reference does an in-memory lookup per chunk; the Spark form is a
theta-join — which naively is a cartesian product.

Scale strategy (SURVEY.md §4.3): discretize the join dimension into grid
buckets; explode each interval to the buckets it overlaps; equi-join on
the bucket key (shuffle- or broadcast-hash, NOT a nested-loop cartesian);
refine with the exact containment predicate; dedup multi-bucket matches.
At 100 TB the equi-join prunes candidate pairs to co-located buckets —
the same trick as the reference's TableBordersCollection page lookup.

``interval_containment_join`` is 1-D (covers the common case: LSN/time
ranges, y-bands, key ranges); 2-D = apply twice on two bucket columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_inner(how: str) -> None:
    """The bucket-prune + exact-refine shape only composes with
    inner-family joins: a post-join filter silently drops the
    null-extended rows an outer join preserves (outer would collapse to
    inner), and crashes on semi/anti output that lacks the other side's
    columns. Callers needing left-outer semantics should left-anti-join
    the inner result back onto the probe side."""
    if how not in ("inner", "cross"):
        raise ValueError(
            f"how={how!r} unsupported: the exact-predicate refinement "
            "runs AFTER the bucket equi-join, which is only sound for "
            "inner joins (see _check_inner)"
        )


def interval_containment_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with lo <= point < hi.

    Both sides get a grid-bucket key (floor(x / width)); intervals explode
    to every bucket they overlap via ``sequence`` (JVM-side, no UDF); the
    equi-join on (extra_on..., bucket) prunes pairs; the exact predicate
    refines. Intervals spanning b buckets produce b candidate rows —
    choose bucket_width ≈ median interval length to keep b small.
    """
    _check_inner(how)
    extra_on = extra_on or []
    p = points.withColumn("_b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    iv = intervals.withColumn(
        "_bs",
        F.sequence(
            F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
            F.floor((F.col(hi_col) - F.lit(1e-12)) / F.lit(bucket_width)).cast("long"),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    on = [*extra_on, "_b"]
    j = p.join(iv, on=on, how=how)
    j = j.filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
    return j.drop("_b")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str, a_hi: str, b_lo: str, b_hi: str,
    bucket_width: float,
    min_fraction: float = 0.0,
    how: str = "inner",
) -> DataFrame:
    """Join interval rows of ``a`` to interval rows of ``b`` that overlap
    them (optionally by more than ``min_fraction`` of a's length).

    Both sides explode to their grid buckets; the equi-join on the bucket
    prunes pairs; the exact overlap predicate refines. Each pair is
    emitted EXACTLY ONCE even when the intervals share several buckets:
    the match counts only in the canonical bucket — the one containing
    ``max(a_lo, b_lo)``, which every overlapping pair shares (the overlap
    region starts there, inside both intervals). No dedup shuffle needed.
    This is the scale form of the reference's table-overlap rejection
    scan (A13, AbstractTableProcessor.java:63-82)."""
    _check_inner(how)

    def bucketed(df, lo, hi):
        return df.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                    F.floor((F.col(hi) - F.lit(1e-12)) / F.lit(bucket_width)).cast("long"),
                )
            ),
        )
    ja = bucketed(a, a_lo, a_hi)
    jb = bucketed(b, b_lo, b_hi)
    j = ja.join(jb, on="_b", how=how)
    frac = overlap_fraction(F.col(a_lo), F.col(a_hi), F.col(b_lo), F.col(b_hi))
    canonical = F.col("_b") == F.greatest(
        F.floor(F.col(a_lo) / F.lit(bucket_width)).cast("long"),
        F.floor(F.col(b_lo) / F.lit(bucket_width)).cast("long"),
    )
    j = j.filter(
        (F.col(a_lo) < F.col(b_hi)) & (F.col(b_lo) < F.col(a_hi))
        & canonical & (frac > min_fraction)
    )
    return j.drop("_b")


def bbox_containment_join(
    points: DataFrame,
    boxes: DataFrame,
    x_col: str, y_col: str,
    x_lo: str, x_hi: str, y_lo: str, y_hi: str,
    x_width: float, y_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """2-D containment join: each point row joins box rows with
    x_lo <= x < x_hi AND y_lo <= y < y_hi.

    The full 2-D form of the reference's table-grid routing
    (TableBorderProcessor.addContentToTableBorder, :53-89: route each
    content chunk to the grid CELL whose bbox contains it). Boxes explode
    to every (bx, by) grid cell they overlap — a 2-D ``sequence`` cross
    via transform/flatten, JVM-side — points key to their single cell;
    the equi-join on the composite cell key prunes candidate pairs to
    co-located cells; exact predicates refine. Cell widths ≈ median box
    extent per axis keep the explosion factor small."""
    _check_inner(how)
    extra_on = extra_on or []
    p = points.withColumn(
        "_bx", F.floor(F.col(x_col) / F.lit(x_width)).cast("long")
    ).withColumn("_by", F.floor(F.col(y_col) / F.lit(y_width)).cast("long"))
    xs = F.sequence(
        F.floor(F.col(x_lo) / F.lit(x_width)).cast("long"),
        F.floor((F.col(x_hi) - F.lit(1e-12)) / F.lit(x_width)).cast("long"),
    )
    ys = F.sequence(
        F.floor(F.col(y_lo) / F.lit(y_width)).cast("long"),
        F.floor((F.col(y_hi) - F.lit(1e-12)) / F.lit(y_width)).cast("long"),
    )
    cells = F.flatten(
        F.transform(xs, lambda bx: F.transform(ys, lambda by: F.struct(
            bx.alias("bx"), by.alias("by")
        )))
    )
    b = (
        boxes.withColumn("_cell", F.explode(cells))
        .withColumn("_bx", F.col("_cell.bx"))
        .withColumn("_by", F.col("_cell.by"))
        .drop("_cell")
    )
    j = p.join(b, on=[*extra_on, "_bx", "_by"], how=how)
    j = j.filter(
        (F.col(x_col) >= F.col(x_lo)) & (F.col(x_col) < F.col(x_hi))
        & (F.col(y_col) >= F.col(y_lo)) & (F.col(y_col) < F.col(y_hi))
    )
    return j.drop("_bx", "_by")


def overlap_fraction(
    a_lo: Column, a_hi: Column, b_lo: Column, b_hi: Column
) -> Column:
    """1-D overlap length / length of a (the reference's overlap-%
    predicate, ContentFilterProcessor.java:102-107) — pure column math."""
    inter = F.greatest(
        F.lit(0.0), F.least(a_hi, b_hi) - F.greatest(a_lo, b_lo)
    )
    return F.when(a_hi > a_lo, inter / (a_hi - a_lo)).otherwise(F.lit(0.0))
