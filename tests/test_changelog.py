"""Changelog (CDF / incremental-scan) reads: net changes between two
snapshots equal an independent pandas state-diff; applying the changelog
to a replica reproduces the upstream state exactly (token-array
equality); pruning touches only changed buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.changelog import (
    apply_changes,
    changed_buckets,
    changes_between,
    commits_between,
)
from opendataloader_pdf_spark.cdc.maintenance import read_at, schema_at
from opendataloader_pdf_spark.datagen import gen_change_events, gen_documents
from opendataloader_pdf_spark.testing import (
    assert_states_equal,
    expected_final_state,
)

N_EVENTS = 10_000
N_DOCS = 1_000
BATCH = 2_000


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cdf")
    gen_change_events(spark, N_EVENTS, N_DOCS, seed=7).write.mode(
        "overwrite"
    ).parquet(str(d / "events"))
    gen_documents(spark, N_DOCS // 2, seed=7).write.mode("overwrite").parquet(
        str(d / "base")
    )
    sink = ParquetMergeSink(spark, str(d / "tbl"), n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(spark.read.parquet(str(d / "base")))
    eng.replay(spark.read.parquet(str(d / "events")), batch_size=BATCH)
    return d, sink


def _state_after(spark, d, n_batches: int | None) -> pd.DataFrame:
    """Independent pandas oracle: table state after the first n batches
    (None = all), keyed by doc_id."""
    ev = spark.read.parquet(str(d / "events")).toPandas()
    if n_batches is not None:
        ev = ev[ev["delivery_seq"] < n_batches * BATCH]
    base = spark.read.parquet(str(d / "base")).toPandas()
    return expected_final_state(ev, base).set_index("doc_id")


def _commit_snap(sink, batch_id: int) -> int:
    for c in sink.manifest()["commits"]:
        if c["batch_id"] == batch_id:
            return c["snapshot_id"]
    raise AssertionError(f"no commit for batch {batch_id}")


def test_changes_match_pandas_state_diff(spark, replayed):
    d, sink = replayed
    sid_a = _commit_snap(sink, 1)  # after batches 0-1
    sid_b = _commit_snap(sink, 3)  # after batches 0-3
    old = _state_after(spark, d, 2)
    new = _state_after(spark, d, 4)

    ch = changes_between(sink, sid_a, sid_b).toPandas()
    assert not ch.empty

    ins = set(new.index) - set(old.index)
    dels = set(old.index) - set(new.index)
    upd = {
        k for k in set(new.index) & set(old.index)
        if new.loc[k, "lsn"] != old.loc[k, "lsn"]
    }
    got = ch.groupby("_change_type")["doc_id"].apply(set).to_dict()
    assert got.get("insert", set()) == ins
    assert got.get("delete", set()) == dels
    assert got.get("update", set()) == upd

    # post-image token equality for inserts/updates; pre-image for deletes
    for _, r in ch.iterrows():
        ref = old if r["_change_type"] == "delete" else new
        w = ref.loc[r["doc_id"], "tokens"]
        want = np.asarray(w if w is not None else [], dtype=np.int64)
        have = np.asarray(r["tokens"] if r["tokens"] is not None else [],
                          dtype=np.int64)
        assert np.array_equal(have, want), r["doc_id"]
        if r["_change_type"] == "delete":
            # tombstone lsn rides the pre-image row, strictly newer
            assert r["lsn"] > old.loc[r["doc_id"], "lsn"]


def test_same_snapshot_and_full_span(spark, replayed):
    d, sink = replayed
    head = sink.snapshot_id()
    assert changes_between(sink, head, head).count() == 0
    # full span from bootstrap: replaying the changelog onto the base
    # state must equal HEAD (checked via apply below); here just sanity:
    # every visible HEAD row whose lsn moved appears
    ch = changes_between(sink, 0, head).toPandas()
    final = _state_after(spark, d, None)
    base = spark.read.parquet(str(d / "base")).toPandas().set_index("doc_id")
    expect_ins = set(final.index) - set(base.index)
    got = ch.groupby("_change_type")["doc_id"].apply(set).to_dict()
    assert got.get("insert", set()) == expect_ins


def test_apply_changes_replicates_exactly(spark, replayed, tmp_path):
    d, sink = replayed
    sid_a = _commit_snap(sink, 2)
    head = sink.snapshot_id()

    replica = ParquetMergeSink(spark, str(tmp_path / "replica"), n_buckets=8)
    replica.initialize(read_at(sink, sid_a), schema_at(sink, sid_a))

    ch = changes_between(sink, sid_a, head)
    apply_changes(ch, replica)

    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]

    def _cols(df):
        for c in cols:
            if c not in df.columns:
                df[c] = None
        return df[cols]

    want = _cols(read_at(sink, head).toPandas())
    got = _cols(replica.read().toPandas())
    assert_states_equal(got, want)
    # lang (the evolved column) replicated too — evolve + apply carried it
    w = want.set_index("doc_id")["lang"]
    g = got.set_index("doc_id")["lang"]
    assert g.fillna("∅").sort_index().equals(w.fillna("∅").sort_index())

    # idempotent: re-applying the same changelog is a no-op by LSN guard
    apply_changes(ch, replica)
    assert_states_equal(_cols(replica.read().toPandas()), want)


def test_changed_buckets_prune(spark, replayed):
    d, sink = replayed
    sid_a = _commit_snap(sink, 3)
    sid_b = _commit_snap(sink, 4)
    touched = changed_buckets(sink, sid_a, sid_b)
    commits = commits_between(sink, sid_a, sid_b)
    assert len(commits) == 1
    assert touched == sorted(commits[0]["buckets"])
    # the diff's scan reads only those buckets: every changed key hashes
    # into the touched set
    ch = changes_between(sink, sid_a, sid_b)
    b_set = set(touched)
    got_b = {
        r["_b"]
        for r in ch.withColumn("_b", sink.bucket_of("doc_id"))
        .select("_b").distinct().collect()
    }
    assert got_b <= b_set


def test_per_commit_composition_equals_net(spark, replayed, tmp_path):
    """Applying each commit's changelog in order == applying the net
    changelog (the CDF contract consumers rely on)."""
    d, sink = replayed
    sid_a = _commit_snap(sink, 1)
    head = sink.snapshot_id()

    replica = ParquetMergeSink(spark, str(tmp_path / "replica2"), n_buckets=8)
    replica.initialize(read_at(sink, sid_a), schema_at(sink, sid_a))
    prev = sid_a
    for c in commits_between(sink, sid_a, head):
        apply_changes(changes_between(sink, prev, c["snapshot_id"]), replica)
        prev = c["snapshot_id"]
    if prev != head:  # trailing schema-evolution snapshots carry no rows
        apply_changes(changes_between(sink, prev, head), replica)

    got = replica.read().toPandas()
    want = read_at(sink, head).toPandas()
    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]
    for c in cols:
        for df in (got, want):
            if c not in df.columns:
                df[c] = None
    assert_states_equal(got[cols], want[cols])


def test_preimage_changelog_and_incremental_agg(spark, replayed):
    """Delta-CDF pre-images: per-update pre+post rows; incremental
    aggregate maintenance from the changelog equals full recompute."""
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.cdc.changelog import (
        apply_delta_state,
        delta_counts,
    )
    from opendataloader_pdf_spark.cdc.maintenance import read_at

    d, sink = replayed
    sid_a = _commit_snap(sink, 1)
    head = sink.snapshot_id()

    cdf = changes_between(sink, sid_a, head, preimages=True)
    counts = dict(
        cdf.groupBy("_change_type").count().collect()
    )
    pre = {r["_change_type"]: r["count"] for r in cdf.groupBy(
        "_change_type").count().collect()}
    assert pre.get("update_preimage", 0) == pre.get("update_postimage", 0) > 0
    # post-only changelog types never appear in pre-image mode
    assert "update" not in pre

    # pre-image rows carry the OLD payload at the OLD lsn
    old = _state_after(spark, d, 2)
    sample = cdf.filter(F.col("_change_type") == "update_preimage").limit(5).collect()
    for r in sample:
        assert r["lsn"] == old.loc[r["doc_id"], "lsn"]

    # incremental MV maintenance: per-source (n_docs, n_tokens) state at
    # snapshot A + delta_counts == full recompute at HEAD
    def full_stats(df):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).alias("n_tokens"),
        )

    state_a = full_stats(read_at(sink, sid_a))
    delta = delta_counts(
        cdf, ["source"],
        {"n_docs": F.lit(1), "n_tokens": F.coalesce(F.col("n_tok"), F.lit(0))},
    )
    maintained = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in apply_delta_state(state_a, delta, ["source"]).collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in full_stats(read_at(sink, head)).collect()
    }
    assert maintained == want

    # a post-only changelog is rejected loudly — the guard rides the agg
    # expression (raise_error), so it surfaces at action time with no
    # extra validation scan
    import pytest as _pytest

    with _pytest.raises(Exception, match="pre-image changelog"):
        delta_counts(changes_between(sink, sid_a, head), ["source"]).collect()

    # apply_changes tolerates a pre-image changelog: pre-image rows are
    # dropped, not double-applied (no duplicate physical rows per key)
    from opendataloader_pdf_spark.cdc import (
        ParquetMergeSink,
        apply_changes,
        schema_at,
    )

    import tempfile

    rep = ParquetMergeSink(
        sink.spark, tempfile.mkdtemp(prefix="cdfpre_"), n_buckets=4
    )
    rep.initialize(read_at(sink, sid_a), schema_at(sink, sid_a))
    apply_changes(cdf, rep)
    got = rep.read().groupBy("doc_id").count().filter("count > 1").count()
    assert got == 0
    assert rep.read().count() == read_at(sink, head).count()
