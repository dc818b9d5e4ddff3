"""Sequence-packing invariants (operators/packing.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from opendataloader_pdf_spark.operators.packing import (
    pack_greedy,
    pack_offset,
    sql_split_token_count,
)


def _docs(spark, sf_dir):
    from opendataloader_pdf_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "source", "doc_id",
            sql_split_token_count(F.col("text")).cast("long").alias("n_tok"),
        )
    )


BUDGET = 512


def test_greedy_budget_respected_and_maximal(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = pack_greedy(d, ["source"], "doc_id", "n_tok", BUDGET).toPandas()
    for (_, _), g in packed.groupby(["source", "pack_id"]):
        assert len(g) >= 1
        if len(g) > 1:
            assert g["n_tok"].sum() <= BUDGET
    # maximality: within each source, pack k's total + pack k+1's first
    # doc must overflow the budget (else greedy would have taken it)
    for _, g in packed.groupby("source"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        totals = g.groupby("pack_id")["n_tok"].sum()
        firsts = g.groupby("pack_id")["n_tok"].first()
        pids = sorted(totals.index)
        for a, b in zip(pids, pids[1:]):
            assert totals[a] + firsts[b] > BUDGET


def test_offset_covers_all_tokens_contiguously(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = pack_offset(d, ["source"], "doc_id", "n_tok", BUDGET).toPandas()
    for _, g in packed.groupby("source"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        starts = g["pack_id"].to_numpy() * BUDGET + g["pack_off"].to_numpy()
        expect = np.concatenate(([0], np.cumsum(g["n_tok"].to_numpy())[:-1]))
        assert (starts == expect).all()


def test_both_strategies_conserve_tokens(spark, sf_dir):
    d = _docs(spark, sf_dir)
    total = d.agg(F.sum("n_tok")).collect()[0][0]
    go = pack_greedy(d, ["source"], "doc_id", "n_tok", BUDGET)
    oo = pack_offset(d, ["source"], "doc_id", "n_tok", BUDGET)
    assert go.agg(F.sum("n_tok")).collect()[0][0] == total
    assert oo.agg(F.sum("n_tok")).collect()[0][0] == total
    assert go.count() == d.count() and oo.count() == d.count()
