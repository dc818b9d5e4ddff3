"""Hot-key skew evidence (north rule: salt-based skew splitting).

Generates a pathologically skewed stream — ``--hot-share`` of all events
hammering ``--hot-frac`` of the documents (default: 90% of events on
~0.01% of keys, i.e. a handful of documents receive millions of updates)
— and replays it twice: with the default single-phase LWW reduction and
with the explicit two-phase salted reduction (doc_id × salt → doc_id).
Asserts both produce the identical final table, prints both throughputs.

Expected shape of the result, and why (events.last_writer_wins notes):
the default reduction is a groupBy/agg, so map-side partial aggregation
already collapses each scan partition to ≤1 row per key BEFORE the
shuffle — a hot document ships O(partitions) rows, not O(events), and no
single reducer serializes the hot key's events. Salting therefore buys
little HERE; it exists for engines/settings where partial aggregation is
unavailable (window-function formulations, wide payloads overflowing the
partial-agg hash map) and as the general pattern for skewed JOINS. The
point of this benchmark is evidence that the chosen plan shape keeps the
skewed and uniform cases within a few percent of each other, which a
row_number()-window dedup would not (all hot-key rows land on one
reducer).

    python tools/skew_bench.py [--events 4000000] [--scenarios 0.9:20,0.99:1]

``--scenarios`` is a comma list of ``hot_share:hot_key_count`` pairs;
each runs default + salted (interleaved, best-of-2), asserts identical
final tables, and lands as one row-pair in BENCH/SKEW.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, ev, workdir, name, salted, batch_size):
    from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine

    sink = ParquetMergeSink(spark, os.path.join(workdir, name), n_buckets=32)
    sink.drop()
    eng = ReplayEngine(spark, sink, salted=salted)
    eng.bootstrap(None)
    t0 = time.time()
    s = eng.replay(ev, batch_size=batch_size)
    secs = time.time() - t0
    return sink, {"salted": salted, "secs": round(secs, 2),
                  "events_per_sec": round(s.events / secs, 1)}


def run_scenario(spark, a, hot_share: float, hot_keys: int,
                 max_tok: int | None = None, docs: int | None = None,
                 events: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.datagen import gen_change_events

    docs = docs or a.docs
    events = events or a.events
    max_tok = max_tok or 64
    hot_frac = hot_keys / docs
    tag = f"{int(hot_share * 100)}p_{hot_keys}k_t{max_tok}_d{docs}"
    skew_path = os.path.join(a.workdir, f"skewed_{events}_{tag}")
    if not os.path.exists(skew_path):
        gen_change_events(
            spark, events, docs, seed=42, max_tok=max_tok,
            hot_frac=hot_frac, hot_share=hot_share, partitions=64,
        ).write.mode("overwrite").parquet(skew_path)
    ev = spark.read.parquet(skew_path)
    ev.agg(F.sum(F.size("tokens")), F.sum("lsn"), F.count("op")).collect()

    top = (ev.groupBy("doc_id").count().orderBy(F.desc("count")).limit(3)
           .collect())
    print(f"[{tag}] hottest keys: "
          f"{[(r['doc_id'], r['count']) for r in top]}", file=sys.stderr)

    results = []
    sinks = {}
    for salted in (False, True, False, True):  # interleaved, best-of-2 each
        sink, r = run(spark, ev, a.workdir, f"tbl_{tag}_{salted}", salted,
                      a.batch_size)
        sinks[salted] = sink
        results.append(r)
    best = {s: min((r for r in results if r["salted"] == s),
                   key=lambda r: r["secs"]) for s in (False, True)}

    # identical final state — the salted reduction must be exact
    plain = sinks[False].read()
    salted_df = sinks[True].read()
    diff = plain.exceptAll(salted_df).count() + salted_df.exceptAll(plain).count()
    assert diff == 0, f"[{tag}] salted vs plain differ by {diff} rows!"

    return {
        "hot_share": hot_share,
        "hot_keys": hot_keys,
        "events": events,
        "max_tok": max_tok,
        "docs": docs,
        "hottest_key_events": int(top[0]["count"]),
        "default": best[False],
        "salted": best[True],
        "identical_final_state": True,
    }


def run_scd2_scenario(spark, a, hot_share: float, hot_keys: int,
                      bucket_width: int) -> dict:
    """SCD2 per-key history window under zipf-hot skew (round-5 task:
    cdc_scd2_history's docstring names range-bucket stitching as the
    hot-key path — measure it). The plain formulation windows a key's
    WHOLE history on one task; the bucketed variant splits the hot
    key's history ~bucket_width versions per task and stitches
    boundaries from a per-(key, bucket) aggregate. Both materialized
    to a count + checksum action, asserted row-identical, timed
    interleaved best-of-2."""
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.cdc.scd2 import (
        scd2_history,
        scd2_history_bucketed,
    )
    from opendataloader_pdf_spark.datagen import gen_change_events

    hot_frac = hot_keys / a.docs
    tag = f"scd2_{int(hot_share * 100)}p_{hot_keys}k"
    skew_path = os.path.join(a.workdir, f"skewed_{a.events}_{tag}")
    if not os.path.exists(skew_path):
        gen_change_events(
            spark, a.events, a.docs, seed=42, max_tok=16,
            hot_frac=hot_frac, hot_share=hot_share, partitions=64,
        ).write.mode("overwrite").parquet(skew_path)
    ev = spark.read.parquet(skew_path).select(
        "doc_id", "lsn", "op", "tokens")
    ev.agg(F.sum(F.size("tokens")), F.sum("lsn")).collect()  # cache warm
    hottest = int(ev.groupBy("doc_id").count()
                  .agg(F.max("count")).collect()[0][0])

    def fold(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64("doc_id", "valid_from", "valid_to",
                                    "is_current"),
                         F.lit(1_000_000_007))).alias("chk"),
        ).collect()[0]

    times = {"plain": [], "bucketed": []}
    folds = {}
    for _ in range(2):
        for name, fn in (("plain", lambda: scd2_history(ev)),
                         ("bucketed", lambda: scd2_history_bucketed(
                             ev, bucket_width=bucket_width))):
            t0 = time.time()
            folds[name] = fold(fn())
            times[name].append(time.time() - t0)
    plain_df, buck_df = scd2_history(ev), scd2_history_bucketed(
        ev, bucket_width=bucket_width)
    diff = (plain_df.exceptAll(buck_df).count()
            + buck_df.exceptAll(plain_df).count())
    assert diff == 0, f"[{tag}] bucketed vs plain differ by {diff} rows!"
    assert folds["plain"] == folds["bucketed"]
    return {
        "hot_share": hot_share, "hot_keys": hot_keys,
        "hottest_key_versions": hottest, "bucket_width": bucket_width,
        "rows": int(folds["plain"]["n"]),
        "plain_secs": round(min(times["plain"]), 2),
        "bucketed_secs": round(min(times["bucketed"]), 2),
        "identical": True,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=4_000_000)
    p.add_argument("--docs", type=int, default=200_000)
    p.add_argument("--scd2", action="store_true",
                   help="run the SCD2 hot-key history-window scenarios "
                        "instead of the LWW-reduction ones; appends an "
                        "SCD2 section to BENCH/SKEW.md")
    p.add_argument("--scd2-bucket-width", type=int, default=65536)
    p.add_argument("--scenarios", default="0.9:20,0.99:1",
                   help="comma list of hot_share:hot_keys[:max_tok[:docs[:events]]] "
                        "specs — the optional tail selects the wide-payload / "
                        "near-unique-key regime the memory-ceiling note predicts")
    p.add_argument("--batch-size", type=int, default=1_000_000)
    p.add_argument("--workdir", default="/dev/shm/skew_bench")
    a = p.parse_args()

    from opendataloader_pdf_spark.session import get_spark

    os.makedirs(a.workdir, exist_ok=True)
    spark = get_spark(app_name="skew-bench", master="local[8]",
                      shuffle_partitions=32,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "32m",
                                  "spark.local.dir": "/dev/shm/skew_local"})
    spark.sparkContext.setLogLevel("ERROR")

    if a.scd2:
        out = []
        for part in a.scenarios.split(","):
            share, keys = part.split(":")[:2]
            out.append(run_scd2_scenario(spark, a, float(share), int(keys),
                                         a.scd2_bucket_width))
        print(json.dumps({"metric": "skew_scd2", "scenarios": out}))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        lines = [
            "",
            "## SCD2 per-key history window under zipf-hot skew",
            "",
            f"{a.events:,} events / {a.docs:,} docs, history materialized "
            f"with the plain per-key window vs the range-bucketed "
            f"stitching path (bucket_width="
            f"{a.scd2_bucket_width:,}); outputs asserted row-identical.",
            "",
            "| skew (share / hot keys) | hottest key versions | rows | "
            "plain secs | bucketed secs |",
            "|---|---|---|---|---|",
        ]
        for s in out:
            lines.append(
                f"| {s['hot_share']:.0%} / {s['hot_keys']} | "
                f"{s['hottest_key_versions']:,} | {s['rows']:,} | "
                f"{s['plain_secs']} | {s['bucketed_secs']} |")
        lines += [
            "",
            "Expected shape: at moderate skew the plain window wins "
            "(the bucketed path pays its stitch aggregate for "
            "nothing); once one key's history dominates the stream, "
            "the plain formulation serializes it on one task — "
            "lead() is NOT a combinable aggregate, so map-side "
            "combine cannot rescue a window — and the bucketed path "
            "wins by bounding the per-task span at bucket_width "
            "versions. Boundary-stitch exactness is property-tested "
            "(tests/test_scd2_bucketed.py). "
            "Produced by `tools/skew_bench.py --scd2`.",
            "",
        ]
        with open(os.path.join(repo, "BENCH", "SKEW.md"), "a") as f:
            f.write("\n".join(lines))
        spark.stop()
        return

    scenarios = []
    for part in a.scenarios.split(","):
        bits = part.split(":")
        share, keys = float(bits[0]), int(bits[1])
        max_tok = int(bits[2]) if len(bits) > 2 else None
        docs = int(bits[3]) if len(bits) > 3 else None
        events = int(bits[4]) if len(bits) > 4 else None
        scenarios.append(run_scenario(spark, a, share, keys,
                                      max_tok=max_tok, docs=docs,
                                      events=events))
    print(json.dumps({"metric": "skew_replay", "scenarios": scenarios}))

    rows = []
    for s in scenarios:
        label = (f"{s['hot_share']:.0%} / {s['hot_keys']} key"
                 f"{'s' if s['hot_keys'] != 1 else ''} "
                 f"(hottest: {s['hottest_key_events']:,} events)")
        if s["max_tok"] != 64 or s["docs"] != a.docs:
            label += (f" — wide payload max_tok={s['max_tok']}, "
                      f"{s['docs']:,} docs / {s['events']:,} events")
        rows.append(f"| {label} | default (single-phase groupBy LWW) | "
                    f"{s['default']['secs']} | "
                    f"{s['default']['events_per_sec']:,} |")
        rows.append(f"| {label} | salted (two-phase doc_id × salt) | "
                    f"{s['salted']['secs']} | "
                    f"{s['salted']['events_per_sec']:,} |")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "SKEW.md"), "w") as f:
        f.write("\n".join([
            "# Hot-key skew evidence",
            "",
            f"Each scenario skews {a.events:,} events over {a.docs:,} "
            f"documents (hot_share of all events target hot_keys "
            f"documents), replayed with both reductions; final tables "
            f"asserted byte-identical per scenario.",
            "",
            "| skew (share / hot keys) | reduction | replay secs | events/sec |",
            "|---|---|---|---|",
            *rows,
            "",
            "The load-bearing observation is that throughput does NOT "
            "collapse as skew concentrates (fewer distinct keys = smaller "
            "partial maps and shuffle); which reduction wins any single "
            "run is shared-host noise (best-of-2 timings swing ±15–20%). "
            "The default plan absorbs even the pathological 99%-on-one-key "
            "case because the LWW reduction is a groupBy aggregation with "
            "map-side partial aggregation — a hot key ships O(partitions) "
            "pre-reduced rows, never O(events), so no reducer serializes "
            "the hot document (a row_number window formulation would). "
            "Salting is the exact associative fallback for settings where "
            "partial aggregation cannot engage.",
            "",
            "**Memory ceiling:** the per-task partial-agg hash map holds "
            "at most one entry per DISTINCT key in that input split; the "
            "ceiling is `distinct keys per split × row payload`. The "
            "wide-payload scenarios (max_tok≥2048, near-unique keys) probe "
            "past it: ObjectHashAggregate falls back to sort-based "
            "map-side combine, which keeps combining — measured round 4: "
            "the single-phase plan stays ahead in every (skew × width) "
            "cell, so salting is the fallback for non-combinable "
            "formulations, not for any regime these plans enter. "
            "Produced by `tools/skew_bench.py`.",
            "",
        ]))
    spark.stop()


if __name__ == "__main__":
    main()
