"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
parallelism levels of the identical job on the identical input:
``local[8]`` (N) and ``local[32]`` (4N), each in its OWN JVM (fresh
subprocess), timing ONLY the replay loop (JVM startup, session build and
datagen excluded — they are per-cluster fixed costs, not per-event work).

    python tools/scaling_bench.py                # full run, writes BENCH/BASELINE.md
    python tools/scaling_bench.py --events 2000000 --docs 100000

Efficiency definition (throughput form, the standard strong-scaling ratio):

    eff = (events_per_sec@4N / events_per_sec@N) / 4

The north rule's bar is eff >= 0.8, i.e. 4x the cores must deliver >= 3.2x
the throughput on the same input.

The child run is exactly what ``spark-submit --py-files pkg.zip
tools/replay_submit.py`` executes on a real cluster — same code path
(ReplayEngine.replay → ParquetMergeSink.merge); only the master URL and
shuffle-partition count differ per cluster size, which is standard
per-deployment tuning, not a workload change.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, events_path: str, workdir: str, batch_size: int) -> None:
    """Run the replay at local[cpus] and print one JSON line."""
    from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
    from opendataloader_pdf_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(events_path)
    n_events = ev.count()  # warm the scan metadata; not part of timed region

    table = os.path.join(workdir, f"table_{cpus}")
    sink = ParquetMergeSink(spark, table, n_buckets=2 * cpus)
    sink.drop()
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)

    t0 = time.time()
    summary = eng.replay(ev, batch_size=batch_size)
    secs = time.time() - t0

    final_rows = sink.read().count()
    print(json.dumps({
        "cpus": cpus,
        "events": summary.events,
        "total_rows_in_log": n_events,
        "batches": len(summary.batches),
        "secs": round(secs, 3),
        "events_per_sec": round(summary.events / secs, 1),
        "final_rows": final_rows,
    }))
    spark.stop()


def run_level(cpus: int, events_path: str, workdir: str, batch_size: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(cpus),
         "--events-path", events_path, "--workdir", workdir,
         "--batch-size", str(batch_size)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"child local[{cpus}] failed")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--events-path", default=None)
    p.add_argument("--workdir", default="/tmp/scaling_bench")
    p.add_argument("--events", type=int, default=2_000_000)
    p.add_argument("--docs", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=500_000)
    p.add_argument("--levels", default="8,32")
    a = p.parse_args()

    if a.child is not None:
        child(a.child, a.events_path, a.workdir, a.batch_size)
        return

    os.makedirs(a.workdir, exist_ok=True)
    events_path = a.events_path or os.path.join(
        a.workdir, f"events_{a.events}_{a.docs}"
    )
    if not os.path.exists(events_path):
        from opendataloader_pdf_spark.datagen import gen_change_events
        from opendataloader_pdf_spark.session import get_spark

        spark = get_spark(app_name="scaling-datagen", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        gen_change_events(spark, a.events, a.docs, seed=42,
                          partitions=64).write.mode("overwrite").parquet(events_path)
        spark.stop()

    levels = [int(x) for x in a.levels.split(",")]
    results = {}
    for cpus in levels:
        print(f"-- running local[{cpus}] ...", file=sys.stderr)
        results[cpus] = run_level(cpus, events_path, a.workdir, a.batch_size)
        print(f"   {results[cpus]}", file=sys.stderr)

    lo, hi = min(levels), max(levels)
    ratio = hi / lo
    speedup = results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
    eff = speedup / ratio
    summary = {
        "metric": "replay_scaling_efficiency",
        "levels": {str(c): results[c] for c in levels},
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "efficiency": round(eff, 3),
        "passes_0.8_bar": eff >= 0.8,
        "events": a.events,
        "docs": a.docs,
    }
    print(json.dumps(summary))

    md = [
        "# BENCH / BASELINE — CDC replay scaling evidence",
        "",
        "North rule: throughput scaling efficiency >= 0.8 between N and 4N",
        "executors. No real cluster exists in this sandbox, so the two",
        "\"cluster sizes\" are two parallelism levels of the *identical* job on",
        "the *identical* pre-generated input, each in its own JVM:",
        f"`local[{lo}]` (N) and `local[{hi}]` (4N). Timed region = the replay",
        "loop only (dedup → LWW reduce → schema diff → LSN-guarded MERGE →",
        "manifest commit per micro-batch); JVM startup and datagen excluded.",
        "",
        f"Input: {a.events:,} change events over {a.docs:,} docs",
        "(zipf-hot keys, 2% exact retransmissions, bounded out-of-order",
        f"delivery, tombstones, schema-v2 tail), batch_size={a.batch_size:,},",
        "generated deterministically by `opendataloader_pdf_spark.datagen`",
        "(seed=42).",
        "",
        "| parallelism | replay secs | events/sec | final rows |",
        "|---|---|---|---|",
    ]
    for c in levels:
        r = results[c]
        md.append(
            f"| local[{c}] | {r['secs']} | {r['events_per_sec']:,} | {r['final_rows']:,} |"
        )
    md += [
        "",
        f"**Speedup {lo}→{hi} cores: {speedup:.2f}× over a {ratio:.0f}× core",
        f"ratio → scaling efficiency = {eff:.3f}**"
        + (" (meets the ≥0.8 bar)." if eff >= 0.8 else " (below the 0.8 bar)."),
        "",
        "Run on a real cluster with:",
        "```bash",
        "cd /root/repo && zip -qr /tmp/pkg.zip opendataloader_pdf_spark",
        "spark-submit --master <cluster> --py-files /tmp/pkg.zip \\",
        "  tools/replay_submit.py --events <events.parquet> --table <sink-dir>",
        "```",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(summary, indent=2),
        "```",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md))
    print(f"wrote BENCH/BASELINE.md (efficiency={eff:.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
