"""spark-submit entry point for the CDC replay engine.

Cluster usage (north rule: "runs via spark-submit --py-files on
multi-executor clusters"):

    cd /root/repo && zip -qr /tmp/pkg.zip opendataloader_pdf_spark
    spark-submit --master yarn --deploy-mode cluster \
        --py-files /tmp/pkg.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        tools/replay_submit.py \
        --events s3://bucket/cdc/events/ \
        --table  s3://bucket/lake/tokens_table \
        --batch-size 50000000

Local smoke:

    spark-submit --master 'local[8]' tools/replay_submit.py \
        --events /tmp/ev --table /tmp/tbl --gen-events 100000 --gen-docs 10000

The job is resumable: re-submitting with the same --table picks up at the
sink's last committed batch_id (exactly-once via manifest commit log).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True, help="parquet path of the change stream")
    p.add_argument("--table", required=True, help="sink table root directory")
    p.add_argument(
        "--batch-size", type=int, default=None,
        help="events per micro-batch; default sizes to max(total/5, 2M). "
             "Throughput floor (measured r1→r2 at sf0.1/local[32]): every "
             "batch pays one copy-on-write of the affected buckets plus "
             "~2s of fixed job cost, so halving the batch count (6→3) "
             "DOUBLED replay throughput (204k→416k events/s). Size "
             "batches so per-batch parallel work dominates that fixed "
             "cost — millions of events per trigger at cluster scale; go "
             "smaller only when commit latency matters more than "
             "throughput (correctness is batch-size-independent; tests "
             "run down to 512)")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--salted", action="store_true",
                   help="explicit two-phase skew-splitting LWW reduction")
    p.add_argument("--mor", action="store_true",
                   help="merge-on-read sink: append-only delta commits, "
                        "LWW resolved at read; run --compact periodically")
    p.add_argument("--compact", action="store_true",
                   help="with --mor: fold over-pressure buckets after the "
                        "replay (compact_ratio=4)")
    p.add_argument("--reduce-strategy", default="agg",
                   choices=["agg", "broadcast"],
                   help="batch reduction: one-shuffle agg (default) or "
                        "winner-fingerprint broadcast semi-join")
    p.add_argument("--quarantine", action="store_true",
                   help="divert malformed events (null key/lsn/op/"
                        "delivery_seq, unknown op) to <table>/_quarantine "
                        "instead of failing or silently applying them")
    p.add_argument("--bootstrap", default=None,
                   help="optional parquet path of the initial base table")
    p.add_argument("--staged", action="store_true",
                   help="write-audit-publish: replay into a STAGE chain "
                        "invisible to readers, publish after the replay "
                        "summary prints clean (aborts on engine error)")
    p.add_argument("--tag", default=None,
                   help="after a successful replay, pin the final "
                        "snapshot under this name (survives expiry)")
    p.add_argument("--expire-keep", type=int, default=None,
                   help="after the replay, expire all but the newest N "
                        "snapshots (tagged snapshots always retained)")
    p.add_argument("--rescale-buckets", type=int, default=None,
                   help="BEFORE the replay, rewrite the table under this "
                        "bucket count (partition evolution; quiesce other "
                        "writers first)")
    p.add_argument("--ddl-stream", action="store_true",
                   help="the event stream carries op='ddl' schema-change "
                        "rows (ALTER TABLE ... in a `ddl` column); parse "
                        "the timeline, derive per-row schema versions "
                        "from LSN, dead-letter premature column use")
    p.add_argument("--vacuum-floor", type=int, default=None,
                   help="after replay, physically remove tombstones with "
                        "lsn <= FLOOR and record the retention floor "
                        "(future sub-floor events dead-letter; pass "
                        "applied_watermark - disorder_window)")
    p.add_argument("--redrive", action="store_true",
                   help="after replay (and vacuum, if any), repair and "
                        "re-inject <table>/_quarantine exactly-once; "
                        "combine with --redrive-map-op / "
                        "--redrive-fill-seq to describe the repair")
    p.add_argument("--redrive-map-op", action="append", default=[],
                   metavar="FROM=TO",
                   help="re-drive repair: rewrite op FROM to TO "
                        "(repeatable; e.g. upsert=update)")
    p.add_argument("--redrive-fill-seq", action="store_true",
                   help="re-drive repair: fill null delivery_seq from lsn")
    p.add_argument("--txn-boundary", action="store_true",
                   help="events carry txn_id and op='commit' markers "
                        "(Debezium transaction metadata): hold each "
                        "transaction until its marker arrives, release "
                        "atomically; buffer state checkpoints under "
                        "<table>/_txn_buffer and survives resubmission")
    p.add_argument("--txn-horizon", type=int, default=None,
                   help="with --txn-boundary: bound buffer state by "
                        "retiring markers and expiring wholly-below-"
                        "floor pending txns at max_lsn - HORIZON. Size "
                        "HORIZON >= max transaction LSN span (commit "
                        "lsn - first data lsn) + delivery disorder; an "
                        "over-long txn is surfaced under aborted/ (re-"
                        "drivable), late rows under late/; default "
                        "None = exact visibility, unbounded state")
    p.add_argument("--toast", action="store_true",
                   help="updates may carry tokens=NULL as an unchanged-"
                        "column sentinel (Postgres TOAST): carry the "
                        "previous image forward; imageless toast "
                        "updates divert to <table>/_toast_violations")
    p.add_argument("--backfill-dir", default=None,
                   help="directory of chunk-<read_lsn>/ parquet dirs "
                        "(bounded upstream selects taken at increasing "
                        "stream positions); interleave them into the "
                        "replay log as lsn-stamped upserts (DBLog-style "
                        "concurrent onboarding, no watermark window)")
    p.add_argument("--gen-events", type=int, default=None,
                   help="generate a synthetic stream of this many events first")
    p.add_argument("--gen-docs", type=int, default=10_000)
    a = p.parse_args()

    # Under spark-submit a session already has master/conf from the CLI;
    # builder.getOrCreate() attaches to it instead of overriding.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("cdc-replay")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from opendataloader_pdf_spark.cdc import (
        MergeOnReadSink,
        ParquetMergeSink,
        ReplayEngine,
    )

    if a.gen_events and not os.path.exists(a.events):
        from opendataloader_pdf_spark.datagen import gen_change_events

        gen_change_events(spark, a.gen_events, a.gen_docs, seed=42).write.mode(
            "overwrite"
        ).parquet(a.events)

    events = spark.read.parquet(a.events)
    if a.backfill_dir:
        import re as _re

        from opendataloader_pdf_spark.cdc.backfill import (
            interleave_backfill_log,
        )

        chunks = []
        for d in sorted(os.listdir(a.backfill_dir)):
            m = _re.fullmatch(r"chunk-(\d+)", d)
            if m:
                chunks.append((
                    spark.read.parquet(os.path.join(a.backfill_dir, d)),
                    int(m.group(1)),
                ))
        if not chunks:
            raise SystemExit(f"no chunk-<lsn>/ dirs under {a.backfill_dir}")
        events = interleave_backfill_log(events, chunks)
        print(json.dumps({"backfill_chunks": [c for _, c in chunks]}))
    if a.batch_size is None:
        # batch-size floor heuristic (see --batch-size help): amortize the
        # fixed per-batch commit cost over >=2M events, but keep >=5
        # batches on small logs so resume/exactly-once still get exercised
        a.batch_size = max(events.count() // 5, 2_000_000)
    cls = MergeOnReadSink if a.mor else ParquetMergeSink
    sink = cls(spark, a.table, n_buckets=a.buckets)
    engine = ReplayEngine(spark, sink, salted=a.salted,
                          reduce_strategy=a.reduce_strategy,
                          quarantine=a.quarantine)
    base = spark.read.parquet(a.bootstrap) if a.bootstrap else None
    engine.bootstrap(base)

    if a.rescale_buckets:
        from opendataloader_pdf_spark.cdc import rescale_buckets

        print(json.dumps({"rescale": rescale_buckets(sink, a.rescale_buckets)}))

    if a.staged:
        from opendataloader_pdf_spark.cdc import (
            abort_staged,
            begin_staged,
            publish,
        )

        staged = begin_staged(sink, resume=True)
        engine = ReplayEngine(spark, staged, salted=a.salted,
                              reduce_strategy=a.reduce_strategy,
                              quarantine=a.quarantine)
        try:
            summary = engine.replay(events, batch_size=a.batch_size)
        except Exception:
            abort_staged(sink)
            raise
        publish(sink)
    elif a.ddl_stream:
        from opendataloader_pdf_spark.cdc import replay_ddl_stream

        summary, timeline, n_premature = replay_ddl_stream(
            spark, sink, events, batch_size=a.batch_size,
            salted=a.salted, reduce_strategy=a.reduce_strategy,
            quarantine=a.quarantine,
        )
        print(json.dumps({
            "ddl_timeline": [[d.lsn, d.action, d.column, d.dtype]
                             for d in timeline],
            "premature_quarantined": n_premature,
        }))
    elif a.txn_boundary:
        from pyspark.sql import functions as F

        from opendataloader_pdf_spark.cdc.txn_boundary import TxnBuffer

        buf = TxnBuffer(spark, os.path.join(a.table, "_txn_buffer"),
                        retain_horizon=a.txn_horizon)
        # null-safe slice position: commit markers from producers that
        # don't stamp a delivery_seq fall back to their lsn — a plain
        # delivery_seq slice would silently exclude them and no
        # transaction would ever release
        pos = F.coalesce(F.col("delivery_seq"), F.col("lsn"))
        hi = int(events.agg(F.max(pos)).collect()[0][0])
        n_rounds = hi // a.batch_size + 1
        start = buf.head()[0] + 1
        summary = None
        for r in range(start, n_rounds):
            batch = events.filter(
                (pos >= r * a.batch_size)
                & (pos < (r + 1) * a.batch_size)
            )
            released, st = buf.feed(batch, r)
            # each round's releases replay in that round's batch slot —
            # the engine resumes/no-ops committed slots, so a crash in
            # the feed→replay→commit window re-runs exactly-once
            s = engine.replay(
                released.drop("txn_id").withColumn(
                    "delivery_seq", F.lit(r * a.batch_size).cast("long")),
                batch_size=a.batch_size, finalize=False,
            )
            buf.commit(r)
            if summary is None:
                summary = s
            else:
                summary.batches.extend(s.batches)
                summary.quarantined += s.quarantined
                summary.expired += s.expired
        if summary is None:
            summary = engine.replay(events.limit(0), batch_size=a.batch_size)
        print(json.dumps({"txn_held": buf.head()[1],
                          "txn_markers": buf.head()[2]}))
    elif a.toast:
        import time as _time

        from pyspark.sql import functions as F

        from opendataloader_pdf_spark.cdc.engine import ReplaySummary
        from opendataloader_pdf_spark.cdc.toast import (
            reduce_batch_toast,
            resolve_toast,
        )

        hi = int(events.agg(F.max("delivery_seq")).collect()[0][0])
        n_rounds = hi // a.batch_size + 1
        summary = ReplaySummary()
        n_viol = 0
        for r in range(sink.last_batch_id() + 1, n_rounds):
            t0 = _time.time()
            batch = events.filter(
                (F.col("delivery_seq") >= r * a.batch_size)
                & (F.col("delivery_seq") < (r + 1) * a.batch_size)
            ).drop("delivery_seq")
            n_events = batch.count()
            red = reduce_batch_toast(batch)
            narrow = sink.read(include_deleted=True).select(
                sink.key, sink.order, "tokens")
            completed, viol = resolve_toast(red, narrow)
            nv = viol.count()
            if nv:
                viol.write.mode("overwrite").parquet(
                    os.path.join(a.table, "_toast_violations", f"batch-{r}"))
                n_viol += nv
            m = sink.merge(completed, r) or {"applied": 0}
            summary.batches.append({
                "batch_id": r, "events": n_events,
                "applied": m.get("applied", 0),
                "secs": _time.time() - t0,
            })
        print(json.dumps({"toast_violations": n_viol}))
    else:
        summary = engine.replay(events, batch_size=a.batch_size)

    if a.tag:
        from opendataloader_pdf_spark.cdc import tag as _tag

        _tag(sink, a.tag)
    if a.expire_keep:
        from opendataloader_pdf_spark.cdc import expire_snapshots

        print(json.dumps({"expire": expire_snapshots(sink, keep_last=a.expire_keep)}))
    if a.mor and a.compact:
        compacted = sink.compact()
        print(json.dumps({"compacted_buckets": compacted}))
    if a.vacuum_floor is not None:
        from opendataloader_pdf_spark.cdc import vacuum_tombstones

        print(json.dumps({"vacuum": vacuum_tombstones(
            sink, a.vacuum_floor, compact_first=a.mor)}))
    if a.redrive:
        from pyspark.sql import functions as F

        from opendataloader_pdf_spark.cdc import redrive_quarantine

        op_map = dict(kv.split("=", 1) for kv in a.redrive_map_op)

        def _repair(q):
            if op_map:
                expr = F.col("op")
                for src, dst in op_map.items():
                    expr = F.when(F.col("op") == src, F.lit(dst)).otherwise(expr)
                q = q.withColumn("op", expr)
            if a.redrive_fill_seq:
                q = q.withColumn(
                    "delivery_seq",
                    F.coalesce(F.col("delivery_seq"), F.col("lsn")))
            return q

        repair = _repair if (op_map or a.redrive_fill_seq) else None
        print(json.dumps({"redrive": redrive_quarantine(
            spark, sink, repair=repair)}))
    print(json.dumps({
        "events": summary.events,
        "applied": summary.applied,
        "quarantined": summary.quarantined,
        "expired": summary.expired,
        "batches": len(summary.batches),
        "secs": round(summary.elapsed, 3),
        "events_per_sec": round(summary.events / max(summary.elapsed, 1e-9), 1),
        "final_rows": sink.read().count(),
        "last_batch_id": sink.last_batch_id(),
        "snapshot_id": sink.snapshot_id(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
