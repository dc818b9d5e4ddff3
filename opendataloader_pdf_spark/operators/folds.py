"""Order-dependent folds as grouped-map pandas UDFs (applyInPandas).

Three reference operators are inherently sequential per group and don't
decompose into fixed-depth windows (SURVEY.md §4.3):

* ``fold_adjacent``  — ParagraphProcessor.processParagraphs
  (core/processors/ParagraphProcessor.java:30-48, passes 68-303; A2):
  iterated merge of adjacent rows while a predicate holds. The reference
  runs 8 sequential passes; here one grouped fold with a pluggable
  vectorized predicate.
* ``stack_levels``   — LevelProcessor.detectLevels
  (core/processors/LevelProcessor.java:33-138; A15): a stack automaton —
  same-style same-x pops to its level, new style pushes.
* ``xy_cut_order``   — XYCutPlusPlusSorter.sort
  (core/processors/readingorder/XYCutPlusPlusSorter.java:69-618; O2,
  paper arXiv:2504.10258): recursive projection-profile segmentation
  with cross-layout masking and largest-gap cuts.

Scale notes: parallelism comes from the grouping key (doc_id, page) —
millions of groups fan out across executors; inside each group the data
is small (a page), so the per-group Python is bounded. Data crosses the
boundary once per group via Arrow. This is the applyInPandas pattern the
survey prescribes; nothing here touches driver memory.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def fold_adjacent(
    df: DataFrame,
    partition: list[str],
    order: str,
    merge_when: Callable[[pd.DataFrame], np.ndarray],
    out_schema: T.StructType,
    reduce_group: Callable[[pd.DataFrame], dict],
) -> DataFrame:
    """Sequential adjacent-merge fold per partition group.

    ``merge_when(pdf) -> bool array`` (len n): True at i ⇒ row i merges
    into the run containing row i-1 (computed vectorized on the sorted
    group). ``reduce_group(run_pdf) -> dict`` collapses one run to one
    output row. Mirrors the reference's pass semantics where the
    predicate sees the already-merged left neighbor only through row
    i-1's attributes — sufficient for all 8 reference passes.
    """

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        if not len(pdf):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        m = np.asarray(merge_when(pdf), dtype=bool)
        m[0] = False
        run_id = np.cumsum(~m)
        rows = [reduce_group(g) for _, g in pdf.groupby(run_id, sort=True)]
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.groupBy(*partition).applyInPandas(apply, schema=out_schema)


def stack_levels(
    df: DataFrame,
    partition: list[str],
    order: str,
    style_cols: list[str],
    level_col: str = "level",
) -> DataFrame:
    """Indent-level assignment via a style stack, per group.

    Walk rows in order; maintain a stack of styles: a row whose style
    equals a stacked style pops back to that depth; a new style pushes
    one deeper. Emits input columns + ``level`` (1-based).
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(level_col, T.IntegerType(), False)]
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        styles = list(zip(*[pdf[c].tolist() for c in style_cols])) if len(pdf) else []
        stack: list[tuple] = []
        levels = np.empty(len(pdf), dtype=np.int32)
        for i, s in enumerate(styles):
            if s in stack:
                depth = stack.index(s)
                del stack[depth + 1:]
            else:
                stack.append(s)
                depth = len(stack) - 1
            levels[i] = depth + 1
        pdf[level_col] = levels
        return pdf

    return df.groupBy(*partition).applyInPandas(apply, schema=out_schema)


def _xy_cut(idx: np.ndarray, lx, rx, by, ty, min_gap: float, prefer_x: bool) -> list[int]:
    """Projection-profile cut; returns reading order of idx.

    Iterative with an explicit work stack — the natural recursion has
    worst-case depth O(n) (each cut may split off a single element,
    e.g. monotonically growing gaps down a page), which blows Python's
    ~1000-frame recursion limit long before the quadratic-matrix guard
    at 10,000 rows would fire. The stack form emits the identical
    order: left segment pushed last so it unwinds first.
    """

    def gaps(lo: np.ndarray, hi: np.ndarray):
        order = np.argsort(lo, kind="stable")
        lo_s, hi_s = lo[order], hi[order]
        run_max = np.maximum.accumulate(hi_s)
        g = lo_s[1:] - run_max[:-1]
        cut_pos = np.nonzero(g >= min_gap)[0]
        return order, cut_pos, g

    out: list[int] = []
    stack: list[np.ndarray] = [idx]
    while stack:
        cur = stack.pop()
        if len(cur) <= 1:
            out.extend(cur.tolist())
            continue
        # evaluate both axes; cut on the axis with the LARGER qualifying
        # gap (XYCutPlusPlusSorter density-ratio axis preference,
        # :247-267); ties prefer y (top-to-bottom reading).
        oy, cy, gy = gaps(-ty[cur], -by[cur])  # y: top→bottom ⇒ desc top
        ox, cx, gx = gaps(lx[cur], rx[cur])
        best_y = gy[cy].max() if len(cy) else -1.0
        best_x = gx[cx].max() if len(cx) else -1.0
        if max(best_y, best_x) >= 0:
            if (best_x > best_y) if not prefer_x else (best_x >= best_y):
                order, cut_pos, g = ox, cx, gx
            else:
                order, cut_pos, g = oy, cy, gy
            best = cut_pos[np.argmax(g[cut_pos])]
            stack.append(cur[order[best + 1:]])   # right — unwinds second
            stack.append(cur[order[: best + 1]])  # left — unwinds first
            continue
        # no cut on either axis: fall back to Y-then-X order
        order = np.lexsort((lx[cur], -ty[cur]))
        out.extend(cur[order].tolist())
    return out


def xy_cut_order(
    df: DataFrame,
    partition: list[str] = ("doc_id", "page"),
    left: str = "left_x",
    right: str = "right_x",
    bottom: str = "bottom_y",
    top: str = "top_y",
    min_gap: float = 5.0,
    cross_layout_beta: float = 0.9,
    density_threshold: float = 0.9,
    rank_col: str = "reading_rank",
) -> DataFrame:
    """XY-Cut++ reading order per page group.

    Phases per the reference (XYCutPlusPlusSorter.sort, :95-116):
    (1) mask cross-layout elements — width ≥ β·max_width with ≥2
    horizontal overlaps (identifyCrossLayoutElements, :133-175);
    (2) density ratio of the remaining content — content area / bounding
    region area (computeDensityRatio, :247-267) — sets the axis
    preference: dense layouts (> threshold, newspapers) prefer
    horizontal cuts, sparse ones vertical. The reference threads this
    flag as the cut tiebreaker (:337); we apply exactly that: the larger
    qualifying gap wins, equal gaps follow the density preference;
    (3) recursive projection-profile cuts;
    (4) two-pointer merge-sort of the masked elements back by top-Y
    (mergeCrossLayoutElements, :558-602 — cross element goes first when
    its top is at or above the next main element's).
    Emits input columns + 0-based ``reading_rank``.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(rank_col, T.IntegerType(), False)]
    )
    part = list(partition)

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pdf.assign(**{rank_col: np.array([], dtype=np.int32)})
        lx = pdf[left].to_numpy(float)
        rx = pdf[right].to_numpy(float)
        by = pdf[bottom].to_numpy(float)
        ty = pdf[top].to_numpy(float)
        width = rx - lx
        # cross-layout mask: very wide elements overlapping ≥2 others
        # horizontally. The O(n²) overlap matrix is bounded by PAGE size
        # (grouping key = one page, tens-to-hundreds of elements), never
        # by table size — guard pathological groups anyway.
        maxw = width.max() if n else 0.0
        if n > 10_000:
            raise ValueError(
                f"xy_cut_order group of {n} rows — the per-page overlap "
                "matrix is quadratic; check the partition key"
            )
        overlaps = (
            (lx[:, None] < rx[None, :]) & (rx[:, None] > lx[None, :]) & ~np.eye(n, dtype=bool)
        ).sum(axis=1)
        masked = (width >= cross_layout_beta * maxw) & (overlaps >= 2) & (n > 2)
        body = np.nonzero(~masked)[0]
        cross = np.nonzero(masked)[0]
        # density ratio over the remaining (body) content
        if len(body):
            bw = rx[body].max() - lx[body].min()
            bh = ty[body].max() - by[body].min()
            region = bw * bh
            content = ((rx[body] - lx[body]) * (ty[body] - by[body])).sum()
            density = min(1.0, content / region) if region > 0 else 1.0
        else:
            density = 1.0
        prefer_horizontal = density > density_threshold
        order = _xy_cut(body, lx, rx, by, ty, min_gap,
                        prefer_x=not prefer_horizontal)
        # two-pointer merge of cross-layout elements by top-Y (desc), x asc
        cross_sorted = sorted(cross.tolist(), key=lambda i: (-ty[i], lx[i]))
        result: list[int] = []
        mi, ci = 0, 0
        while mi < len(order) or ci < len(cross_sorted):
            if ci >= len(cross_sorted):
                result.append(order[mi]); mi += 1
            elif mi >= len(order):
                result.append(cross_sorted[ci]); ci += 1
            elif ty[cross_sorted[ci]] >= ty[order[mi]]:
                result.append(cross_sorted[ci]); ci += 1
            else:
                result.append(order[mi]); mi += 1
        ranks = np.empty(n, dtype=np.int32)
        for r, i in enumerate(result):
            ranks[i] = r
        pdf[rank_col] = ranks
        return pdf

    return df.groupBy(*part).applyInPandas(apply, schema=out_schema)
