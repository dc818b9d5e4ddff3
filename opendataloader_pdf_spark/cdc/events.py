"""Change-event transforms: dedup by (doc_id, lsn) and last-writer-wins.

Reference parity: dedup generalizes ``TextProcessor.removeSameTextChunks``
(core/processors/TextProcessor.java:84-105) — sort-by-value single-pass
duplicate elimination keeping the *later* occurrence — to CDC retransmission
dedup; LWW generalizes the same keep-last rule to per-key max-LSN selection
(SURVEY.md §2.5 "last-writer-wins (target)").

Scale notes
-----------
``last_writer_wins`` uses ``max_by`` aggregation, NOT a row_number window:

* a groupBy/agg gets **map-side partial aggregation** — each input
  partition pre-reduces to at most one row per doc_id before the shuffle,
  so a hot document with millions of updates in a batch ships O(partitions)
  rows, not O(events). A window (row_number over partitionBy doc_id) would
  shuffle every event of the hot key to one reducer — the exact straggler
  the north rule's skew clause warns about.
* ``salted`` mode adds an *explicit* two-phase reduction
  (doc_id × salt → doc_id) for engines/settings where partial aggregation
  is disabled or payload rows are too wide for the in-memory hash map;
  the reduction is associative (max-by-lsn), so phases compose exactly.

Dedup of exact (doc_id, lsn) retransmissions needs no separate shuffle:
duplicates carry identical payloads, so max-by-lsn absorbs them. The
standalone ``dedup_events`` transform exists for pipelines that need the
deduplicated *stream* (e.g. metrics on unique events), and is windowless
for the same skew reasons when ``use_window=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: columns that define the event payload applied to the base table
PAYLOAD_COLS = ("op", "tokens", "n_tok", "source", "lang", "schema_version", "ts")

#: the only ops the engine applies; anything else is malformed
VALID_OPS = ("insert", "update", "delete", "patch")


def invalid_event_cond(key: str, order: str):
    """Never-null boolean: event row is malformed — the full EVENT_SCHEMA
    non-null contract (key, lsn, delivery_seq, schema_version) plus a
    known op, plus a non-negative delivery_seq (the tail's delivery
    position starts at 0; a negative one belongs to NO batch slot, so
    admitting it would silently drop the row from every slice).
    op.isNull() is tested before the isin so the disjunction can't
    evaluate to SQL null, which a filter would silently drop. (``ts`` is
    also non-null by schema but is informational only — the engine never
    branches on it, so a null ts isn't worth diverting.)"""
    return (
        F.col(key).isNull()
        | F.col(order).isNull()
        | F.col("delivery_seq").isNull()
        | (F.col("delivery_seq") < 0)
        | F.col("schema_version").isNull()
        | F.col("op").isNull()
        | ~F.col("op").isin(*VALID_OPS)
    )


def dedup_events(events: DataFrame, use_window: bool = False) -> DataFrame:
    """Drop exact (doc_id, lsn) retransmissions, keeping one row.

    Default path is an aggregation (map-side combinable). The window path
    (`row_number() == 1`) is kept for parity with the reference's
    sort-based single pass and for cases needing a stable "which copy"
    rule beyond payload identity.
    """
    if use_window:
        w = Window.partitionBy("doc_id", "lsn").orderBy(F.desc("delivery_seq"))
        return (
            events.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    payload = [c for c in events.columns if c not in ("doc_id", "lsn")]
    agg = [F.max_by(F.struct(*payload), F.col("delivery_seq")).alias("_p")]
    out = events.groupBy("doc_id", "lsn").agg(*agg)
    return out.select("doc_id", "lsn", *[F.col(f"_p.{c}").alias(c) for c in payload])


def last_writer_wins(
    events: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Reduce a batch of events to one winning row per key (max lsn).

    Exact-duplicate (key, lsn) rows are absorbed (identical payload).
    ``salted=True`` forces an explicit two-phase skew-splitting reduction:
    pre-reduce per (key, salt), then combine per key — associative, so the
    result is identical to the one-phase reduction.
    """
    payload = [c for c in events.columns if c != key]
    winner = F.max_by(F.struct(*payload), F.col(order)).alias("_w")

    if salted:
        salt = F.pmod(F.xxhash64(F.col(order)), F.lit(n_salts)).alias("_salt")
        pre = events.select(key, salt.alias("_salt"), *payload).groupBy(key, "_salt").agg(winner)
        pre = pre.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])
        out = pre.groupBy(key).agg(winner)
    else:
        out = events.groupBy(key).agg(winner)
    return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def reduce_batch(events: DataFrame, salted: bool = False, n_salts: int = 16) -> DataFrame:
    """Full batch reduction: dedup + LWW in one associative aggregation.

    Output: one row per doc_id — the event with the highest lsn — ready
    for the LSN-guarded MERGE. One shuffle total.
    """
    return last_writer_wins(events, salted=salted, n_salts=n_salts)


def reduce_batch_broadcast(
    events: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    n_keys: int | None = None,
) -> DataFrame:
    """Batch reduction that never shuffles payload columns at event
    cardinality.

    The one-shuffle ``reduce_batch`` ships its map-side partial winners —
    rows WITH token arrays — through the exchange (each scan task
    contributes up to one wide row per key it saw, so a key spread over k
    tasks ships k payloads). This variant splits winner *selection* from
    winner *payload*:

    1. narrow winner agg: ``(key, max(order))`` — a shuffle of two small
       columns at event cardinality, map-side combinable (hot keys
       collapse per task, so the skew clause is satisfied without salt);
    2. the winner set comes back over the scan as a broadcast of 64-bit
       **fingerprints** ``xxhash64(key, max(order))`` — one LONG per key
       (not the key strings themselves), so the collect is small and the
       broadcast relation is a long-keyed hash map, the cheapest kind to
       build; a left-semi join on the fingerprint filters the batch to
       winning events with NO shuffle of the batch side;
    3. one wide shuffle of the ~|keys| surviving rows runs the EXACT
       last-writer-wins agg (max_by over (order, delivery_seq)) — a
       fingerprint collision admits only sub-max rows for their key,
       which lose here, so the result is exact; retransmission ties
       break on the freshest delivery. The output stays hash-partitioned
       on ``key``, which the downstream MERGE join reuses.

    Net: the wide exchange shrinks from O(partial winners) to O(keys),
    at the price of a second scan of the batch (cheap: the scan is
    columnar and the filter is a semi join probe). The caller gates on
    the winner-set size (engine ``broadcast_reduce_max_keys``, 8 bytes
    per key broadcast) and falls back to ``reduce_batch`` above it — a
    batch touching more keys than a broadcast should carry must shuffle,
    same as any broadcast join.
    """
    payload = [c for c in events.columns if c != key]
    tie = F.col("delivery_seq") if "delivery_seq" in events.columns else F.lit(0)
    pick = F.max_by(F.struct(*payload), F.struct(F.col(order), tie))

    sel = (
        events.groupBy(key)
        .agg(F.max(order).alias("_maxo"))
        .select(F.xxhash64(F.col(key), F.col("_maxo")).alias("_wh"))
    )
    filt = events.join(
        F.broadcast(sel),
        F.xxhash64(F.col(key), F.col(order)) == F.col("_wh"),
        "left_semi",
    )
    out = filt.groupBy(key).agg(pick.alias("_w"))
    return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def expand_rekey(events: DataFrame, key: str = "doc_id",
                 new_key: str = "new_doc_id") -> DataFrame:
    """Primary-key-change events: ``op='rekey'`` rows carrying the new
    key expand to a delete at the OLD key + an insert at the NEW key,
    both at the rekey's own lsn — Debezium's key-change contract (an
    UPDATE that changes the key is emitted as a tombstoned delete for
    the old key and a create for the new one, never as an in-place
    update, because downstream partitioning is keyed).

    Pure Catalyst (filter + two projections + union, no shuffle, no
    Python); the pair shares the rekey's delivery_seq, so any
    delivery_seq-sliced micro-batching keeps it atomic — a batch cut
    can never apply the insert without its tombstone. Per-key LWW
    downstream stays exact: the delete is the old key's freshest event
    at that lsn; the insert competes at the new key like any write.
    """
    # null-safe: op=NULL is malformed, and `(op == 'rekey')` evaluates
    # to SQL NULL for it — a plain filter pair would drop the row from
    # BOTH branches before the engine's quarantine could dead-letter it
    # (the invalid_event_cond rule above)
    is_rk = F.col("op").eqNullSafe("rekey")
    normal = events.filter(~is_rk).drop(new_key)
    rk = events.filter(is_rk)
    keep = [c for c in events.columns if c not in (key, new_key, "op")]
    payload_null = ("tokens", "n_tok", "source", "lang")
    dele = rk.select(
        F.col(key),
        F.lit("delete").alias("op"),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(c)
            if c in payload_null else F.col(c)
            for c in keep
        ],
    )
    ins = rk.select(
        F.col(new_key).alias(key),
        F.lit("insert").alias("op"),
        *[F.col(c) for c in keep],
    )
    cols = normal.columns
    return normal.unionByName(dele.select(cols)).unionByName(ins.select(cols))
