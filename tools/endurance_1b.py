"""Endurance evidence, one decade up: 10^9 events / 10M docs / 20
tranches of 50M at local[32] (VERDICT r4 task #4).

The log is ONE logical 1B-event stream (the same deterministic
id→event mapping gen_change_events uses, dup_frac=0 so ids == the
event space), materialized a 50M-event tranche at a time — tranche
boundaries are multiples of the 64-wide disorder window, so
delivery_seq never crosses a tranche and each tranche is exactly
engine batch slot k. This is how a real tail consumes a binlog (no
78 GB materialized log), and it keeps datagen time OUT of the
measured replay time. expire_snapshots(keep_last=2) runs every 4
tranches — the bounded-storage maintenance a 10^9-event table needs
anyway — and its time is reported separately.

Evidence sought: per-tranche replay throughput FLAT in tranche index
(no degradation with table age/size), bounded driver state, the
schema-evolution epoch (v1→v2 at 0.8 * 10^9) absorbed mid-run.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from opendataloader_pdf_spark.session import get_spark
from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.cdc.maintenance import expire_snapshots
from opendataloader_pdf_spark.datagen import EVENT_SCHEMA, _event_frame
from bench import host_calibration

N_EVENTS = int(os.environ.get("END1B_EVENTS", 1_000_000_000))
N_DOCS = int(os.environ.get("END1B_DOCS", 10_000_000))
# multiple of DISORDER_WINDOW (64)
TRANCHE = int(os.environ.get("END1B_TRANCHE", 50_000_000))
SEED = 42
MAX_TOK = 64
HOT_FRAC, HOT_SHARE = 0.01, 0.30

spark = get_spark(app_name="endurance-1b", master="local[32]",
                  shuffle_partitions=64,
                  extra_conf={"spark.local.dir": "/dev/shm/spark_local_1b",
                              "spark.sql.files.maxPartitionBytes": "32m"})
spark.sparkContext.setLogLevel("ERROR")
wd = "/dev/shm/endurance_1b"
shutil.rmtree(wd, ignore_errors=True)
os.makedirs(wd)


def gen_tranche(k: int):
    lo, hi = k * TRANCHE, (k + 1) * TRANCHE

    def generate(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            yield _event_frame(ids, N_EVENTS, N_DOCS, SEED, MAX_TOK,
                               HOT_FRAC, HOT_SHARE, 0.0)

    return spark.range(lo, hi, numPartitions=64).mapInPandas(
        generate, schema=EVENT_SCHEMA)


sink = ParquetMergeSink(spark, wd + "/table", n_buckets=128)
sink.drop()
eng = ReplayEngine(spark, sink)
eng.bootstrap(None)

total_replay, total_events = 0.0, 0
rows = []
for k in range(N_EVENTS // TRANCHE):
    tp = f"{wd}/tranche_{k}"
    t0 = time.time()
    gen_tranche(k).write.mode("overwrite").parquet(tp)
    gen_s = time.time() - t0
    ev = spark.read.parquet(tp)
    calib = host_calibration()
    t0 = time.time()
    s = eng.replay(ev, batch_size=TRANCHE, finalize=False)
    rep_s = time.time() - t0
    shutil.rmtree(tp, ignore_errors=True)
    maint_s = 0.0
    if (k + 1) % 4 == 0:
        t0 = time.time()
        expire_snapshots(sink, keep_last=2)
        maint_s = time.time() - t0
    total_replay += rep_s
    total_events += s.events
    row = {"tranche": k, "events": s.events, "gen_secs": round(gen_s, 1),
           "replay_secs": round(rep_s, 1),
           "ev_per_s": round(s.events / rep_s, 0),
           "maint_secs": round(maint_s, 1), "calib_secs": round(calib, 3)}
    rows.append(row)
    print(json.dumps(row), flush=True)

print(json.dumps({
    "tag": "endurance-1b", "events": total_events,
    "replay_secs": round(total_replay, 1),
    "events_per_sec": round(total_events / total_replay, 0),
    "final_rows": sink.read().count(),
    "per_tranche_ev_per_s": [r["ev_per_s"] for r in rows],
}), flush=True)
spark.stop()
