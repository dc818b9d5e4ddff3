"""Custom stateful streaming operator: cross-micro-batch continuation
linking via ``applyInPandasWithState``.

This is SURVEY.md §2.9's "cross-partition continuation state" seed made
real: the reference links lists that continue across PAGES — consecutive
lists whose labels continue one numbering sequence get previous/next
links (ListProcessor.java:403-522, checkNeighborLists). In a streaming
ingest the page boundary becomes a MICRO-BATCH boundary: the last run of
one batch may be continued by the first run of the next, so the linker
must carry per-key state (last seen order + sequence value) across
batches. That is exactly Spark's arbitrary-stateful-processing contract.

Semantics (batch-equivalent by construction): for each key, rows ordered
by ``order_col``; emit a link (key, prev_order, order) whenever a row's
``seq_col`` equals the previous row's value + 1 — the label-continuation
predicate. The batch twin is a plain lag() window (operators/adjacency
J4), which the pytest uses as the oracle: streaming the same rows in ANY
file split yields byte-identical links.

Scale notes: state per key is two longs (last order, last seq) — bounded
and tiny; grouping shuffles each micro-batch once by key (the same
shuffle the batch window would do); per-group work inside the UDF is a
vectorized numpy shift-compare, no per-row Python. Requires micro-batches
in delivery order per key (true of a file-tailed binlog; in-batch
disorder is absorbed by the sort, cross-batch disorder is not — the same
delivery-order contract as streaming/tail.py's disorder_window).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LINK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("prev_order", T.LongType(), False),
        T.StructField("order", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_order", T.LongType(), False),
        T.StructField("last_seq", T.LongType(), False),
    ]
)


def _linker(key_col: str, order_col: str, seq_col: str):
    def link(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = pd.concat(list(pdfs), ignore_index=True)
        # malformed rows (null order/seq surface as NaN after the Arrow
        # transfer) would crash the int64 conversion and abort the whole
        # query; the linker's contract is continuity over WELL-FORMED
        # sequence numbers, so they are ignored here (the ingest path's
        # quarantine owns dead-lettering them)
        rows = rows.dropna(subset=[order_col, seq_col])
        rows = rows.sort_values(order_col, kind="mergesort")
        order = rows[order_col].to_numpy("int64")
        seq = rows[seq_col].to_numpy("int64")
        if len(order) == 0:
            return
        if state.exists:
            last_order, last_seq = state.get
            prev_order = np.concatenate(([last_order], order[:-1]))
            prev_seq = np.concatenate(([last_seq], seq[:-1]))
            cont = seq == prev_seq + 1
        else:
            prev_order = np.concatenate(([0], order[:-1]))
            cont = np.concatenate(([False], seq[1:] == seq[:-1] + 1))
        state.update((int(order[-1]), int(seq[-1])))
        if cont.any():
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "prev_order": prev_order[cont],
                    "order": order[cont],
                }
            )

    return link


def link_continuations_stream(
    grouped_stream: DataFrame, key_col: str, order_col: str, seq_col: str
) -> DataFrame:
    """Apply the stateful continuation linker to a STREAMING frame."""
    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        _linker(key_col, order_col, seq_col),
        outputStructType=LINK_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_link_continuations(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    order_col: str,
    seq_col: str,
    event_schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Tail ``events_dir`` (AvailableNow), link continuations across all
    its micro-batches, append links to ``out_dir``; returns the result."""
    stream = (
        spark.readStream.schema(event_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    sel = stream.select(
        stream[key_col].cast("string").alias(key_col),
        stream[order_col].cast("long").alias(order_col),
        stream[seq_col].cast("long").alias(seq_col),
    )
    q = (
        link_continuations_stream(sel, key_col, order_col, seq_col)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir, format="parquet")
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
