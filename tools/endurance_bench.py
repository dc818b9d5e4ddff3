"""Endurance evidence: 192M events / 4.8M docs / 8 batches at local[32].
Shows sustained (non-degrading) per-batch throughput and bounded driver
state — the 10^10-event trajectory argument measured at 4x the scaling
input."""
import json, os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from opendataloader_pdf_spark.session import get_spark
from opendataloader_pdf_spark.cdc import ParquetMergeSink, ReplayEngine
from opendataloader_pdf_spark.datagen import gen_change_events
from bench import host_calibration

spark = get_spark(app_name="endurance", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.local.dir": "/dev/shm/spark_local_end",
                              "spark.sql.files.maxPartitionBytes": "32m"})
spark.sparkContext.setLogLevel("ERROR")
wd = "/dev/shm/endurance"
os.makedirs(wd, exist_ok=True)
ep = wd + "/events_192m"
if not os.path.exists(ep + "/_SUCCESS"):
    t0 = time.time()
    gen_change_events(spark, 192_000_000, 4_800_000, seed=42,
                      partitions=256).write.mode("overwrite").parquet(ep)
    print(f"datagen: {time.time()-t0:.0f}s", flush=True)
ev = spark.read.parquet(ep)
from pyspark.sql import functions as F
n = ev.count()
ev.agg(F.sum(F.size("tokens")), F.sum("lsn"), F.sum("delivery_seq"),
       F.count("doc_id")).collect()  # page-cache warm
print("events in log:", n, flush=True)

# warm-up replay at full size (JIT tier-up), then the measured pass
for tag in ("warmup", "measured"):
    sink = ParquetMergeSink(spark, wd + "/table", n_buckets=128)
    sink.drop()
    eng = ReplayEngine(spark, sink)
    eng.bootstrap(None)
    calib = host_calibration()
    t0 = time.time()
    s = eng.replay(ev, batch_size=24_000_000)
    dt = time.time() - t0
    out = {"tag": tag, "events": s.events, "batches": len(s.batches),
           "secs": round(dt, 1), "events_per_sec": round(s.events / dt, 0),
           "calib_secs": round(calib, 3),
           "per_batch": [{"batch": b["batch_id"], "events": b["events"],
                          "secs": round(b["secs"], 1),
                          "ev_per_s": round(b["events"] / b["secs"], 0)}
                         for b in s.batches],
           "final_rows": sink.read().count()}
    print(json.dumps(out), flush=True)
spark.stop()
