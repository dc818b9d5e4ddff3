"""Point lookups (bucket-pruned + pushed key predicate) and the
per-commit changelog follower."""

from __future__ import annotations

import pytest

from opendataloader_pdf_spark.cdc import (
    ParquetMergeSink,
    ReplayEngine,
    apply_changes,
    follow_changes,
    read_at,
    schema_at,
)
from opendataloader_pdf_spark.datagen import gen_change_events
from opendataloader_pdf_spark.testing import assert_states_equal


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lkp")
    ev = gen_change_events(spark, 8_000, 800, seed=17)
    ev.write.mode("overwrite").parquet(str(d / "events"))
    sink = ParquetMergeSink(spark, str(d / "tbl"), n_buckets=16)
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    eng.replay(spark.read.parquet(str(d / "events")), batch_size=2_000)
    return sink


def test_lookup_matches_full_scan_filter(spark, table):
    all_rows = {r["doc_id"]: r["lsn"] for r in table.read().collect()}
    some = sorted(all_rows)[:7]
    got = {r["doc_id"]: r["lsn"] for r in table.lookup(some).collect()}
    assert got == {k: all_rows[k] for k in some}
    # a deleted/absent key returns nothing
    assert table.lookup(["no-such-doc"]).count() == 0
    assert table.lookup([]).count() == 0


def test_lookup_prunes_buckets(spark, table):
    some = sorted(r["doc_id"] for r in table.read().limit(3).collect())
    df = table.lookup(some)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan's file index holds only the keys' buckets, not all 16
    want = {
        r["b"] for r in
        spark.createDataFrame([(k,) for k in some], "doc_id string")
        .select(table.bucket_of("doc_id").alias("b")).collect()
    }
    import re
    opened = set(re.findall(r"bucket=(\d+)", plan))
    assert opened  # pruned paths are visible in the scan
    assert opened == {str(b) for b in want}
    # key predicate reaches the parquet scan
    assert "PushedFilters" in plan and "In(doc_id" in plan.replace(" ", "")[
        plan.replace(" ", "").find("PushedFilters"):]


def test_follow_changes_replicates_history(spark, table, tmp_path):
    sid0 = table.manifest()["commits"][0]["snapshot_id"]
    replica = ParquetMergeSink(spark, str(tmp_path / "rep"), n_buckets=8)
    replica.initialize(read_at(table, sid0), schema_at(table, sid0))

    n_commits = 0
    last = sid0
    for commit, ch in follow_changes(table, sid0):
        apply_changes(ch, replica)
        n_commits += 1
        last = commit["snapshot_id"]
    assert n_commits >= 2
    if last != table.snapshot_id():  # trailing schema-evo snapshot
        from opendataloader_pdf_spark.cdc import changes_between

        apply_changes(changes_between(table, last, table.snapshot_id()), replica)

    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "lsn"]

    def _cols(df):
        for c in cols:
            if c not in df.columns:
                df[c] = None
        return df[cols]

    assert_states_equal(
        _cols(replica.read().toPandas()), _cols(table.read().toPandas())
    )
