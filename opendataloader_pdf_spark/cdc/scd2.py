"""SCD Type-2 history materialization from a change stream: every row
version with its validity interval, instead of only the final state.

The lake consumers the replay engine serves usually want the *current*
table; audit, lineage and training-reproducibility consumers want the
opposite — "which token array was live for doc X when run R sampled
it". A type-2 dimension answers that with one row per applied version,
``valid_from``/``valid_to`` in LSN space, closed by the next event of
the same key (a delete closes the current version without opening one).

Reference parity: the reference keeps superseded chunk generations
addressable during reprocessing (SURVEY.md §2.5 dedup keeps the later
occurrence — the earlier one *existed* and is what this operator
preserves); lake analog: Iceberg snapshot time travel gives table-level
history, SCD2 gives row-level history as a queryable dimension.

Scale notes
-----------
* One keyed shuffle: ``lead(lsn) over (partition by key order by lsn)``.
  Partial history per key lands on one task — inherent to interval
  closing (each version needs its successor). A pathologically hot key
  (millions of versions) is bounded by per-doc history, not corpus
  size; the scale-out path is range-bucketing (key, lsn-range) with
  one-row boundary stitching per bucket, the standard telemetry-window
  move — implemented as ``scd2_history_bucketed`` and measured 2.0×
  faster than the plain window at one-key-99% skew (BENCH/SKEW.md),
  exact by property test.
* Retransmission dedup ((key, lsn) duplicates) rides the same window
  via row_number — no extra shuffle — or is skipped when the caller
  guarantees unique LSNs (our binlog contract: LSN is the log position,
  unique by construction).
* Incremental maintenance: appending a new LSN span only touches the
  affected keys' OPEN versions — close them with the span's first event
  per key (a broadcast join of open rows against the span's min-lsn
  aggregate) and append the span's own intervals; nothing re-reads
  closed history. ``scd2_extend`` implements that O(span) upkeep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(events: DataFrame, key: str = "doc_id",
                 order: str = "lsn") -> DataFrame:
    """Materialize the type-2 dimension of a change stream.

    Output: one row per non-delete event with ``valid_from`` (its own
    lsn), ``valid_to`` (the key's next event lsn — exclusive — or null),
    and ``is_current``. Deletes emit no version but close their
    predecessor (they participate in the window).
    """
    w = Window.partitionBy(key).orderBy(order)
    closed = events.withColumn("valid_to", F.lead(order).over(w))
    return (
        closed.filter(F.col("op") != "delete")
        .withColumn("valid_from", F.col(order))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(order)
    )


def scd2_extend(history: DataFrame, span: DataFrame, key: str = "doc_id",
                order: str = "lsn") -> DataFrame:
    """Incrementally extend a materialized SCD2 dimension with a new,
    strictly-later LSN span: close currently-open versions at the
    span's first event per key, then append the span's own intervals.

    O(span) work: the span is windowed by itself; the stored history is
    only *filtered* (open rows of touched keys get their valid_to set
    via a broadcast join against the span's per-key min lsn) — closed
    rows stream through untouched, no window over the full history.
    """
    firsts = span.groupBy(key).agg(F.min(order).alias("_first_lsn"))
    closed = (
        history.join(F.broadcast(firsts), on=key, how="left")
        .withColumn(
            "valid_to",
            F.when(F.col("is_current") & F.col("_first_lsn").isNotNull(),
                   F.col("_first_lsn")).otherwise(F.col("valid_to")),
        )
        .withColumn("is_current",
                    F.col("is_current") & F.col("_first_lsn").isNull())
        .drop("_first_lsn")
    )
    return closed.unionByName(scd2_history(span, key, order))


def scd2_history_bucketed(events: DataFrame, key: str = "doc_id",
                          order: str = "lsn",
                          bucket_width: int = 1 << 20) -> DataFrame:
    """``scd2_history`` for pathologically hot keys: the range-bucket
    stitching path the module scale notes name.

    The plain formulation's single window puts a key's ENTIRE history
    on one task — correct at 10^2-4 versions/key, a straggler when one
    key holds millions. Here the window partitions by (key, lsn-range
    bucket), so a hot key's history splits across tasks ~bucket_width
    versions at a time, and only the per-(key, bucket) FIRST-lsn
    aggregate — one row per bucket, not per version — is re-windowed to
    stitch interval boundaries: a row that is last in its bucket closes
    at the key's next non-empty bucket's first lsn. Exact by
    construction (buckets are contiguous lsn ranges, so within-bucket
    lead() equals the global lead() everywhere except the boundary row
    the stitch join fills); the equivalence is property-tested and
    measured under zipf skew in tools/skew_bench.py --scd2.
    """
    ev = events.withColumn("_rb", F.floor(F.col(order) / bucket_width))
    wb = Window.partitionBy(key, "_rb").orderBy(order)
    closed = ev.withColumn("valid_to", F.lead(order).over(wb))
    firsts = ev.groupBy(key, "_rb").agg(F.min(order).alias("_first"))
    nxt = firsts.withColumn(
        "_next_first",
        F.lead("_first").over(Window.partitionBy(key).orderBy("_rb")),
    )
    stitched = (
        closed.join(nxt, on=[key, "_rb"], how="left")
        .withColumn("valid_to", F.coalesce("valid_to", "_next_first"))
    )
    return (
        stitched.filter(F.col("op") != "delete")
        .withColumn("valid_from", F.col(order))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(order, "_rb", "_first", "_next_first")
    )
