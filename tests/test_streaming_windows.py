"""Watermarked windowed aggregation (streaming/windows.py) and the
cross-micro-batch stateful continuation linker (streaming/stateful.py).

Both are checked against their BATCH twins: the windowed agg against the
same groupBy on the full static frame, the stateful linker against the
plain lag() window — streaming any file split must reproduce the batch
answer exactly (modulo the not-yet-finalized window tail, which is
asserted explicitly)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.datagen import gen_change_events, EVENT_SCHEMA
from opendataloader_pdf_spark.streaming.windows import (
    run_windowed_activity,
    windowed_activity,
)
from opendataloader_pdf_spark.streaming.stateful import run_link_continuations

WM = "180 seconds"  # > 2x the datagen disorder window (64 s): no real drops

EVENT_ARROW = pa.schema([
    ("lsn", pa.int64()), ("doc_id", pa.string()), ("op", pa.string()),
    ("n_tok", pa.int32()), ("source", pa.string()), ("lang", pa.string()),
    ("schema_version", pa.int32()), ("ts", pa.timestamp("us")),
    ("delivery_seq", pa.int64()),
    ("patch_start", pa.int32()), ("patch_del", pa.int32()),
])


def _write_ordered_files(pdf: pd.DataFrame, d: str, n_files: int,
                         schema: pa.Schema = EVENT_ARROW) -> None:
    """Chunk rows (already sorted) into n_files parquet files whose
    mtimes force the file stream to consume them in chunk order."""
    os.makedirs(d, exist_ok=True)
    size = (len(pdf) + n_files - 1) // n_files
    now = time.time() - n_files - 5
    for i in range(n_files):
        chunk = pdf.iloc[i * size:(i + 1) * size]
        path = os.path.join(d, f"part-{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False,
                                 safe=False),
            path,
        )
        os.utime(path, (now + i, now + i))


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("winstream")
    pdf = (
        gen_change_events(spark, 6_000, 500, seed=23)
        .drop("tokens")  # narrow: this suite aggregates scalars only
        .toPandas()
        .sort_values("delivery_seq")
        .reset_index(drop=True)
    )
    src = str(d / "events")
    _write_ordered_files(pdf, src, n_files=4)
    return d, pdf, src


SCHEMA_NO_TOKENS = T.StructType(
    [f for f in EVENT_SCHEMA.fields if f.name != "tokens"]
)


def test_windowed_activity_matches_batch_for_finalized_windows(
    spark, event_files, tmp_path
):
    d, pdf, src = event_files
    got = run_windowed_activity(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        window_size="60 seconds", watermark_delay=WM,
        max_files_per_trigger=1, event_schema=SCHEMA_NO_TOKENS,
    ).toPandas()

    # batch twin on the full static frame
    static = spark.createDataFrame(pdf)
    batch = windowed_activity(static, "60 seconds", WM).toPandas()

    # finalized = window end <= final watermark (max ts - delay)
    horizon = pdf["ts"].max() - pd.Timedelta(seconds=180)
    fin = batch[batch["win_end"] <= horizon]
    assert len(got) > 10
    key = ["win_start", "op"]
    g = got.sort_values(key).reset_index(drop=True)
    f = fin.sort_values(key).reset_index(drop=True)
    # every emitted window is final and correct; no finalized window missing
    pd.testing.assert_frame_equal(
        g[["win_start", "op", "n_events", "tok_volume", "max_lsn"]],
        f[["win_start", "op", "n_events", "tok_volume", "max_lsn"]],
        check_dtype=False,
    )

    # exactly-once growth: append a later tranche, rerun from checkpoint
    later = pdf.copy()
    later["ts"] = later["ts"] + pd.Timedelta(hours=3)
    later["lsn"] = later["lsn"] + 1_000_000
    later["delivery_seq"] = later["delivery_seq"] + 1_000_000
    p = os.path.join(src, "part-900.parquet")
    pq.write_table(
        pa.Table.from_pandas(later, schema=EVENT_ARROW, preserve_index=False,
                             safe=False), p)
    got2 = run_windowed_activity(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        window_size="60 seconds", watermark_delay=WM,
        max_files_per_trigger=1, event_schema=SCHEMA_NO_TOKENS,
    ).toPandas()
    # previously emitted windows appear exactly once (no re-emission)
    counts = got2.groupby(["win_start", "op"]).size()
    assert (counts == 1).all()
    assert len(got2) > len(got)


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    base = pd.Timestamp("2024-06-01", tz="UTC")
    mk = lambda ts_off, lsn: {
        "lsn": lsn, "doc_id": f"doc{lsn}", "op": "write", "n_tok": 1,
        "source": "s", "lang": "en", "schema_version": 1,
        "ts": base + pd.Timedelta(seconds=ts_off),
        "delivery_seq": lsn, "patch_start": None, "patch_del": None,
    }
    # Watermark semantics (verified): a window's state is evicted at the
    # end of the first batch whose START watermark passes its end; a late
    # row arriving in that SAME batch is still absorbed (wm is a finality
    # guarantee, not an eager filter), one arriving in a LATER batch is
    # dropped (numRowsDroppedByWatermark). So: f1 advances wm to 420,
    # f2's batch evicts+emits window [0,60), f3's late ts=20 row drops.
    f1 = pd.DataFrame([mk(0, 1), mk(30, 2), mk(600, 3)])
    f2 = pd.DataFrame([mk(620, 5)])
    f3 = pd.DataFrame([mk(20, 4), mk(630, 6)])               # ts=20: late
    src = str(tmp_path / "ev")
    os.makedirs(src)
    now = time.time() - 10
    for i, f in enumerate([f1, f2, f3]):
        p = os.path.join(src, f"part-{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(f, schema=EVENT_ARROW, preserve_index=False,
                                 safe=False), p)
        os.utime(p, (now + i, now + i))
    got = run_windowed_activity(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        window_size="60 seconds", watermark_delay=WM,
        max_files_per_trigger=1, event_schema=SCHEMA_NO_TOKENS,
    ).toPandas()
    first = got[got["win_start"].dt.tz_localize("UTC") == base]
    # the finalized first window counts lsn 1 and 2 but NOT the late lsn 4
    assert len(first) == 1 and int(first["n_events"].iloc[0]) == 2


def test_stateful_linker_matches_batch_lag_across_any_split(spark, tmp_path):
    # three keys; seq runs that continue across the file boundaries
    rows = []
    seqs = {
        "a": [1, 2, 3, 7, 8, 20, 21, 22, 23],
        "b": [5, 5, 6, 9, 10, 11, 1, 2],
        "c": [100, 101, 102, 103, 104, 105, 106, 107, 108],
    }
    order = 0
    for i in range(9):
        for k, s in seqs.items():
            if i < len(s):
                rows.append({"key": k, "order": order, "seq": s[i]})
                order += 1
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "runs")
    runs_arrow = pa.schema(
        [("key", pa.string()), ("order", pa.int64()), ("seq", pa.int64())]
    )
    _write_ordered_files(pdf, src, n_files=3, schema=runs_arrow)

    schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("order", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])
    got = run_link_continuations(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        "key", "order", "seq", schema, max_files_per_trigger=1,
    ).toPandas().sort_values(["key", "order"]).reset_index(drop=True)

    # batch oracle: plain lag window (J4 form)
    from pyspark.sql import Window
    w = Window.partitionBy("key").orderBy("order")
    exp = (
        spark.createDataFrame(pdf, schema)
        .withColumn("prev_seq", F.lag("seq").over(w))
        .withColumn("prev_order", F.lag("order").over(w))
        .filter(F.col("seq") == F.col("prev_seq") + 1)
        .select("key", "prev_order", "order")
        .toPandas().sort_values(["key", "order"]).reset_index(drop=True)
    )
    assert len(exp) > 5  # the fixture really exercises continuation
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # grow the stream: a 4th file continuing key c from 109 links to 108
    extra = pd.DataFrame([{"key": "c", "order": order, "seq": 109}])
    p = os.path.join(src, "part-999.parquet")
    pq.write_table(pa.Table.from_pandas(extra, preserve_index=False), p)
    got2 = run_link_continuations(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        "key", "order", "seq", schema, max_files_per_trigger=1,
    ).toPandas()
    new = got2[~got2["order"].isin(got["order"])]
    assert len(got2) == len(got) + 1 and (new["key"] == "c").all()
