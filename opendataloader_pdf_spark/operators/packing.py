"""Sequence packing — assigning variable-length tokenized documents to
fixed-token-budget context windows (pretraining batch construction).

The reference's layout stage packs content into fixed page frames
(reference: PageProcessor flow, see SURVEY.md §3.1); the LLM-pipeline
analog is packing token sequences into context windows. Two strategies:

* ``pack_offset`` — contiguous-bin packing: documents are laid out
  end-to-end in a deterministic order and the window id is the running
  token offset divided by the budget. Pure window cumsum → stays
  JVM-side in one shuffle per partition column, SQL-expressible
  (oracle-checkable), and exactly reproducible on any cluster size.
  Documents may straddle a boundary (the usual "packed dataset with
  cross-document attention masking" layout).

* ``pack_greedy`` — exact first-fit-sequential packing: a document never
  straddles a window; a new window opens when the next document would
  overflow the budget. The reset-on-overflow prefix scan is inherently
  sequential per group, so it runs in grouped ``applyInPandas`` — but
  NOT as a per-row Python loop: pack boundaries are found with
  ``np.searchsorted`` on the cumulative-length array, one call per
  OUTPUT WINDOW (O(#packs) Python iterations, each a vectorized binary
  search), so cost scales with packs, not rows.

At 100 TB both parallelize by the partition columns (e.g. source shard):
each group's scan is independent; the shuffle key is the partition
column set and skew equals shard imbalance, not token imbalance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_offset(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    len_col: str,
    budget: int,
) -> DataFrame:
    """Contiguous-bin packing: adds ``pack_id`` (window index) and
    ``pack_off`` (token offset inside the window) columns.

    ``order_col`` must be unique within a partition: the running sum
    uses an explicit ROWS frame (the default RANGE frame would include
    ORDER BY *peers*, so two docs tied on order_col would claim the
    same offset and overflow the budget), and with ties the row order
    itself — hence the offsets — would be nondeterministic."""
    w = (
        Window.partitionBy(*part_cols).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(len_col).over(w) - F.col(len_col)
    return df.withColumn(
        "pack_id", F.floor(start / F.lit(budget)).cast("long")
    ).withColumn("pack_off", (start % F.lit(budget)).cast("long"))


def pack_greedy(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    len_col: str,
    budget: int,
) -> DataFrame:
    """Exact first-fit-sequential packing: adds ``pack_id``; each pack's
    total length is ≤ budget unless a single document alone exceeds it
    (such a document gets its own pack)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        lens = pdf[len_col].to_numpy(dtype=np.int64)
        cum = np.cumsum(lens)
        ids = np.zeros(len(lens), dtype=np.int64)
        start, pid = 0, 0
        while start < len(lens):
            base = cum[start - 1] if start else 0
            j = int(np.searchsorted(cum, base + budget, side="right"))
            j = max(j, start + 1)  # an oversized doc still gets a pack
            ids[start:j] = pid
            pid += 1
            start = j
        pdf["pack_id"] = ids
        return pdf

    return df.groupBy(*part_cols).applyInPandas(pack, out_schema)


def sql_split_token_count(text: Column) -> Column:
    """JVM-side whitespace token count in SQL-split semantics — matches
    DuckDB ``length(regexp_split_to_array(trim(text), '\\s+'))``, which
    returns 1 for empty text (one empty segment). Deliberately named
    apart from functions.text.whitespace_token_count, whose linguistic
    semantics return 0 for empty/whitespace-only text: the two counts
    differ exactly on blank docs, and packing oracles are written in
    the SQL-split form."""
    return F.size(F.split(F.trim(text), r"\s+"))
