"""Partial-update ("patch") change events: token-array splices in the
CDC apply path.

SURVEY.md §7 phase 3(f): a CDC stream over pre-tokenized sequences
carries not only whole-row writes but *partial* token edits — "delete
``patch_del`` tokens at ``patch_start``, insert these" — the reference
analog being the coordinate-indexed chunk splits that rewrite part of a
row's payload (TableBorderProcessor.java:159-170, SpecialTableProcessor.
java:61-81). Unlike full writes, patches do NOT reduce by last-writer-
wins: every patch after the authoritative predecessor must apply, in LSN
order.

The contract is the batch-independent pure LSN-order fold (mirrored by
testing.expected_final_state):

* insert/update replace the row if fresher than the current guard;
* delete tombstones it (guard = the delete's own lsn);
* a patch applies iff a LIVE row with smaller lsn exists at its position
  in the fold — onto that row's tokens; otherwise it can only ever apply
  after a re-insert with an lsn BETWEEN the tombstone's (or nothing) and
  its own, so the engine parks it in the cross-batch PENDING set
  (SURVEY.md §2.9 continuation state) where the LSN guard retires it the
  moment any fresher row exists.

Resolution always compares against the **authoritative predecessor** =
whichever of {in-batch full write W, current table row} has the higher
lsn. Applying patches onto a stale W (or letting unapplied pending
patches inflate a row's lsn) would smuggle stale writes past the MERGE
guard — the unified predecessor rule below is what keeps the fold exact
under arbitrary micro-batch cuts and bounded out-of-order delivery.

The reduction is ONE map-side-combinable aggregation (max_by ignores
rows whose ordering expression is null, so the full-write winner and the
patch list ride the same groupBy). Application is an Arrow pandas UDF:
per Arrow batch, numpy slice-and-concatenate per row over its few
patches — no per-token Python, no per-row JVM calls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_NEG_INF = -(1 << 62)


def has_patch_columns(df: DataFrame) -> bool:
    return "patch_start" in df.columns and "patch_del" in df.columns


def reduce_batch_patches(events: DataFrame, key: str = "doc_id",
                         order: str = "lsn") -> DataFrame:
    """Reduce a mixed full-write/patch batch to one row per key.

    Output: key, op/tokens/n_tok/source[/lang] (the full-write winner W's
    payload, null if no W), lsn (= W.lsn, or the max patch lsn when no
    W), _patches (LSN-sorted array<struct<lsn,start,dele,ins>>, only
    those fresher than W — older ones are absorbed by it), _has_w.
    """
    is_patch = F.col("op") == "patch"
    payload = [c for c in events.columns
               if c not in (key, "patch_start", "patch_del")]
    w_struct = F.when(~is_patch, F.struct(*payload))
    w_ord = F.when(~is_patch, F.col(order))
    patch_struct = F.when(
        is_patch,
        F.struct(
            F.col(order).alias("lsn"),
            F.col("patch_start").alias("start"),
            F.col("patch_del").alias("dele"),
            F.col("tokens").alias("ins"),
        ),
    )
    red = events.groupBy(key).agg(
        F.max_by(w_struct, w_ord).alias("_w"),
        # array_distinct absorbs exact (doc_id, lsn) retransmissions of a
        # patch — the F2 dedup rule; duplicates carry identical payloads
        F.array_sort(F.array_distinct(F.collect_list(patch_struct))).alias("_patches_all"),
        F.max(order).alias("_maxlsn"),
    )
    has_w = F.col("_w").isNotNull()
    w_lsn = F.col(f"_w.{order}")
    fresh = F.when(
        has_w,
        F.filter(F.col("_patches_all"), lambda p: p["lsn"] > w_lsn),
    ).otherwise(F.col("_patches_all"))
    out_cols = [
        F.col(key),
        F.when(has_w, F.col("_w.op")).otherwise(F.lit("patch")).alias("op"),
        F.when(has_w, F.col("_w.tokens")).alias("tokens"),
        F.when(has_w, F.col("_w.n_tok")).alias("n_tok"),
        F.when(has_w, F.col("_w.source")).alias("source"),
        # W's own lsn — patch lsns must NOT inflate it (they only count
        # once actually applied, in resolve_patches)
        F.when(has_w, w_lsn).otherwise(F.col("_maxlsn")).alias(order),
        fresh.alias("_patches"),
        has_w.alias("_has_w"),
    ]
    if "lang" in events.columns:
        out_cols.insert(5, F.when(has_w, F.col("_w.lang")).otherwise(
            F.lit(None).cast("string")).alias("lang"))
    if "delivery_seq" in events.columns:
        out_cols.append(
            F.when(has_w, F.col("_w.delivery_seq")).alias("delivery_seq")
        )
    return red.select(*out_cols)


@pandas_udf(T.ArrayType(T.IntegerType()))
def _apply_patches(tokens: pd.Series, patches: pd.Series,
                   guard: pd.Series) -> pd.Series:
    """Splice-fold: for each row apply its LSN-ordered patches with
    lsn > guard. Start/delete clamp to the current array bounds (append
    when start ≥ len) — clamping is part of the operator contract and is
    mirrored by the pandas oracle. numpy slice+concat per patch; rows in
    the Arrow batch are independent."""
    out = []
    g = guard.to_numpy()
    for i in range(len(tokens)):
        t = tokens.iloc[i]
        cur = np.asarray(t if t is not None else [], dtype=np.int32)
        ps = patches.iloc[i]
        if ps is not None:
            for p in ps:
                if p["lsn"] <= g[i]:
                    continue  # stale vs the predecessor's LSN guard
                s = int(min(max(p["start"], 0), len(cur)))
                d = int(min(max(p["dele"], 0), len(cur) - s))
                ins = np.asarray(
                    p["ins"] if p["ins"] is not None else [], dtype=np.int32
                )
                cur = np.concatenate((cur[:s], ins, cur[s + d:]))
        out.append(cur)
    return pd.Series(out)


def merge_pending(reduced: DataFrame, pending: DataFrame | None,
                  key: str = "doc_id", order: str = "lsn") -> DataFrame:
    """Fold the previous batches' pending (parked) patches into this
    batch's reduction: concat+sort the patch arrays (those at or below
    this batch's full write W are absorbed by it); keys present only in
    pending become patch-only rows. The row lsn stays W's own — pending
    patch lsns count only when applied (resolve_patches)."""
    if pending is None:
        return reduced
    p = pending.select(F.col(key), F.col("_patches").alias("_pp"))
    j = reduced.join(p, on=key, how="full_outer")
    both = F.array_sort(
        F.array_distinct(  # a retransmission may land in a later batch
            F.concat(
                F.coalesce(F.col("_pp"), F.array()),
                F.coalesce(F.col("_patches"), F.array()),
            )
        )
    )
    # NOTE: the combined-patches filter references the INPUT `lsn`; no
    # output column may alias `lsn` in the same select, or Spark's
    # implicit lateral column alias resolution would shadow it.
    has_w = F.coalesce(F.col("_has_w"), F.lit(False))
    w_lsn = F.when(has_w, F.col(order))
    fresh = F.when(
        has_w, F.filter(both, lambda pp: pp["lsn"] > w_lsn)
    ).otherwise(both)
    step1 = j.select(
        F.col(key),
        F.coalesce(F.col("op"), F.lit("patch")).alias("op"),
        "tokens", "n_tok", "source",
        *(["lang"] if "lang" in reduced.columns else []),
        F.col(order).alias("_in_lsn"),
        fresh.alias("_patches"),
        has_w.alias("_has_w"),
        *(["delivery_seq"] if "delivery_seq" in reduced.columns else []),
    )
    # patch-only rows carry the max patch lsn as their nominal lsn
    out_lsn = F.coalesce(
        F.col("_in_lsn"),
        F.when(F.size("_patches") > 0, F.element_at("_patches", -1)["lsn"]),
    )
    return step1.withColumn(order, out_lsn).drop("_in_lsn")


def resolve_patches(reduced: DataFrame, sink, affected: list[int],
                    key: str = "doc_id", order: str = "lsn",
                    floor: int | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """Resolve every patch-bearing key against its authoritative
    predecessor and emit (changes, pending).

    predecessor = the fresher of {in-batch full write W, current table
    row} by lsn. Then:

    * predecessor live, applicable patches → splice onto its tokens;
      change lsn = last applied patch lsn.
    * predecessor live, none applicable → W passes through if it is the
      predecessor (normal MERGE guard applies); otherwise nothing to do.
    * predecessor is a winning delete W → the delete goes through; its
      fresher patches park in PENDING (a re-insert with an intermediate
      lsn may still arrive).
    * predecessor is a tombstone/absent (and W, if any, is stale) → no
      change; fresh patches park in PENDING.

    ``floor`` is the disorder watermark: the caller guarantees every full
    write with lsn ≤ floor has been delivered. A patch with lsn > floor
    must NOT apply yet — an intermediate write (pred.lsn < w.lsn <
    patch.lsn) could still be in flight, and applying early would raise
    the row guard past it (the monotone-apply race). Such patches park in
    PENDING even when a predecessor is live, and apply in a later batch
    once the watermark passes them. ``floor=None`` means +∞ (apply
    everything — correct for delivery-ordered logs or a terminal flush).
    """
    floor_lsn = F.lit(floor if floor is not None else (1 << 62))
    no_patch = reduced.filter(F.size("_patches") == 0).drop("_patches", "_has_w")
    pr = reduced.filter(F.size("_patches") > 0)

    table_cols = [f.name for f in sink.current_schema().fields]
    table_lang = "lang" in table_cols
    has_lang = "lang" in reduced.columns  # batch may carry lang before the
    # table evolves; base lang only exists once the table has the column
    # lang must flow through the OUTPUT whenever EITHER side has it: a
    # lang-less batch (v1 producer) patching a row on an evolved table
    # would otherwise emit no lang column, _align would null-fill it,
    # and a token-only splice would wipe the stored lang. Full writes
    # from a lang-less producer legitimately set lang=null (the row is
    # replaced); patches preserve the base value.
    emit_lang = has_lang or table_lang
    if table_lang and not has_lang:
        no_patch = no_patch.withColumn("lang", F.lit(None).cast("string"))
    base = sink.read(buckets=affected, include_deleted=True).select(
        F.col(key),
        F.col("tokens").alias("_b_tokens"),
        F.col("source").alias("_b_source"),
        *([F.col("lang").alias("_b_lang")] if table_lang else []),
        F.col(order).alias("_b_lsn"),
        F.col("_deleted").alias("_b_del"),
    )
    b_lang = (F.col("_b_lang") if table_lang
              else F.lit(None).cast("string"))
    oj = pr.join(base, on=key, how="left")

    b_lsn = F.coalesce(F.col("_b_lsn"), F.lit(_NEG_INF))
    b_live = F.col("_b_lsn").isNotNull() & ~F.coalesce(F.col("_b_del"), F.lit(False))
    use_w = F.col("_has_w") & (F.col(order) > b_lsn)
    pred_lsn = F.when(use_w, F.col(order)).otherwise(b_lsn)
    pred_live = F.when(use_w, F.col("op") != "delete").otherwise(b_live)
    appl = F.filter(
        F.col("_patches"),
        lambda p: (p["lsn"] > pred_lsn) & (p["lsn"] <= floor_lsn),
    )
    apply_now = pred_live & (F.size(appl) > 0)
    # parked: fresher than the predecessor but either above the disorder
    # watermark, or without a live predecessor to apply onto
    parked = F.filter(
        F.col("_patches"),
        lambda p: (p["lsn"] > pred_lsn)
        & ((p["lsn"] > floor_lsn) | ~pred_live),
    )

    pred_tokens = F.when(use_w, F.col("tokens")).otherwise(F.col("_b_tokens"))
    tokens_out = F.when(
        apply_now, _apply_patches(pred_tokens, appl, F.lit(_NEG_INF))
    ).otherwise(F.col("tokens"))
    emit = use_w | apply_now

    step = oj.withColumn("_appl", appl).withColumn("_parked", parked).select(
        F.col(key),
        F.when(use_w, F.col("op")).otherwise(F.lit("update")).alias("_op_out"),
        tokens_out.alias("_tokens_out"),
        F.when(use_w, F.col("source")).otherwise(F.col("_b_source")).alias("_src_out"),
        *([
            F.when(use_w,
                   F.col("lang") if has_lang
                   else F.lit(None).cast("string"))
            .otherwise(b_lang).alias("_lang_out")
        ] if emit_lang else []),
        F.when(apply_now, F.element_at("_appl", -1)["lsn"])
        .otherwise(F.col(order)).alias("_lsn_out"),
        emit.alias("_emit"),
        apply_now.alias("_applied"),
        (F.size("_parked") > 0).alias("_park"),
        F.col("_parked"),
        *(["delivery_seq"] if "delivery_seq" in reduced.columns else []),
    )

    changes_pr = step.filter(F.col("_emit")).select(
        F.col(key),
        F.col("_op_out").alias("op"),
        F.col("_tokens_out").alias("tokens"),
        F.when(F.col("_tokens_out").isNotNull(), F.size("_tokens_out"))
        .cast("int").alias("n_tok"),
        F.col("_src_out").alias("source"),
        *([F.col("_lang_out").alias("lang")] if emit_lang else []),
        F.col("_lsn_out").alias(order),
        *([F.col("delivery_seq")] if "delivery_seq" in reduced.columns else []),
    )
    pending = step.filter(F.col("_park")).select(
        F.col(key), F.col("_parked").alias("_patches")
    )

    cols = no_patch.columns
    return no_patch.unionByName(changes_pr.select(cols)), pending


class PendingStore:
    """Checkpointed cross-batch pending-patch state, shared by the batch
    replay loop and the streaming tail.

    Layout: ``root/batch-{id}/part-*.parquet`` + ``root/HEAD`` holding
    "batch_id row_count" (count taken from parquet footers at write time,
    so an empty pending is knowable without a Spark job). HEAD commits
    with an atomic rename AFTER the merge commit; if a crash lands
    between the two, re-running the batch is safe — its merge is an
    idempotent no-op and re-consumed pending patches die by the LSN
    guard."""

    def __init__(self, spark, root: str, key: str = "doc_id"):
        self.spark = spark
        self.root = root
        self.key = key

    def head(self) -> tuple[int, int]:
        import os

        path = os.path.join(self.root, "HEAD")
        if os.path.exists(path):
            with open(path) as f:
                parts = f.read().split()
            return int(parts[0]), int(parts[1]) if len(parts) > 1 else 0
        return -1, 0

    def finalized_at(self) -> int | None:
        """Batch id of a terminal pending flush, or None. A finalized sink
        must not be re-replayed against a LONGER log — events landing in
        the flush's batch slot would be skipped (the flush consumed that
        id); ReplayEngine.replay raises on this."""
        import os

        path = os.path.join(self.root, "HEAD")
        if os.path.exists(path):
            with open(path) as f:
                parts = f.read().split()
            if len(parts) > 2 and parts[2] == "F":
                return int(parts[0])
        return None

    def mark_finalized(self, batch_id: int) -> None:
        _, n = self.head()
        self._commit_head(batch_id, n, finalized=True)

    def read(self):
        import os

        b, n = self.head()
        if b < 0 or n == 0:
            return None, 0
        path = os.path.join(self.root, f"batch-{b}")
        if not os.path.isdir(path):
            return None, 0
        return self.spark.read.parquet(path), n

    def write(self, batch_id: int, pending: DataFrame) -> None:
        import os

        import pyarrow.parquet as pq

        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"batch-{batch_id}")
        # repartition, not coalesce: coalesce(1) would pull the whole
        # upstream patch-resolution join into ONE task; repartition
        # keeps the join parallel and single-tasks only the (tiny)
        # post-shuffle pending write
        pending.repartition(1).write.mode("overwrite").parquet(path)
        n = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        self._commit_head(batch_id, n)

    def write_empty(self, batch_id: int) -> None:
        """Advance HEAD with an empty set — pyarrow direct write (a Spark
        LocalRelation write costs ~5s of fixed latency)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(self.root, f"batch-{batch_id}")
        os.makedirs(path, exist_ok=True)
        schema = pa.schema([
            (self.key, pa.string()),
            ("_patches", pa.list_(pa.struct([
                ("lsn", pa.int64()), ("start", pa.int32()),
                ("dele", pa.int32()), ("ins", pa.list_(pa.int32())),
            ]))),
        ])
        pq.write_table(schema.empty_table(), os.path.join(path, "part-0.parquet"))
        self._commit_head(batch_id, 0)

    def _commit_head(self, batch_id: int, n_rows: int,
                     finalized: bool = False) -> None:
        import os

        from opendataloader_pdf_spark.cdc.storage import _atomic_write

        # _atomic_write (flush + fsync + rename) rather than a bare
        # replace: without the fsync a power loss can surface HEAD as a
        # zero-byte file under delayed allocation, bricking head() on
        # every later replay until hand-repaired
        _atomic_write(
            os.path.join(self.root, "HEAD"),
            f"{batch_id} {n_rows}" + (" F" if finalized else ""),
        )
