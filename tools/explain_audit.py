"""Physical-plan audit: for each headline catalog query, record the
plan properties that matter at 100 TB — pushed filters, pruned read
schemas, join strategies (broadcast vs shuffle), and whole-stage-codegen
coverage — into PLANS.md.

    python tools/explain_audit.py [sf_dir]

The point is evidence, not vibes: a scan that reads all columns for a
2-column projection, or a dim join that shuffles instead of
broadcasting, shows up here as a red flag.
"""

from __future__ import annotations

import io
import re
import sys

sys.path.insert(0, "/root/repo")

AUDITED = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_nation_revenue",
    "f2_dedup_lww",
    "a1_sessionize_gap",
    "j1_interval_containment",
    "a12_existence_prune",
    "j7_anti_join",
    "asof_join_last_order",
    "cdc_lineage_metrics",
    "cosine_topk",
    "token_pipeline",
    "a13_overlap_reject",
    "token_splice",
    "a16_distinct_runs",
    "a8_label_intervals",
    "f_filter_stack",
    "a9_list_build",
    "f5_bounds_filter",
    "j1_bbox_containment",
    "s2_tagged_scan",
    "j6_lineart_assoc",
    "ngram_jaccard_pairs",
    "exact_substring_dup",
    "dsir_importance",
    "rollup_corpus_stats",
    "f11_source_prune",
    "embedding_near_dup_lsh",
    "a10_lists_from_paragraphs",
    "minhash_lsh_dedup",
    "o2_xy_cut_order",
    "w1_windowed_activity",
    "p0_full_assembly",
    "t1_sequence_pack",
    "t3_packed_sequences",
    "ivf_topk",
    "dedup_components",
    "split_assign",
    "minhash_incremental",
    "p1_corpus_pipeline",
    "decontaminate",
    "cdc_changelog",
    "cdc_incremental_stats",
    "multimodal_decode",
    "minhash_dedup_checkable",
    "simhash_docs",
    "pii_scrub",
    "length_percentile_filter",
    "repetition_quality",
    "lm_perplexity_filter",
    "bm25_retrieval",
    "feature_hash_embed",
    "stratified_sample_exact",
    "bpe_pair_counts",
    "token_kl_mixture",
    "t2_pack_greedy",
    "a11_cluster_1d",
    "k1_json_lines",
    "multimodal_frame_sample",
    "lsh_topk",
    "ivf_topk_checkable",
    "ann_recall",
    "multimodal_audio_decode",
    "multimodal_video_decode",
    "cdc_envelope_parse",
    "cdc_lsn_gap_audit",
    "cdc_point_lookup",
    "o2_xy_cut_checkable",
    "cdc_ddl_stream",
    "cdc_ddl_timeline",
    "cdc_bloom_lookup",
    "cdc_vacuum_retention",
    "cdc_quarantine_redrive",
    "cdc_mor_compact",
    "cdc_replica_sync",
    "cdc_rescale_midstream",
    "cdc_txn_boundary",
    "cdc_toast_coalesce",
    "cdc_scd2_history",
    "cdc_full_lifecycle",
    "multimodal_mjpeg_decode",
    "bpe_encode",
    "cdc_pk_change",
    "cdc_chunked_backfill",
    "cdc_consumer_lag",
]


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> dict:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_cols": [len(s.split(",")) if s.strip() else 0 for s in schemas],
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "shuffle_joins": len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)),
        "bnl_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "python_udf": len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from opendataloader_pdf_spark.queries import QUERIES
    from opendataloader_pdf_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = io.StringIO()
    out.write("# PLANS — physical-plan audit of headline queries\n\n")
    out.write(f"Source: `tools/explain_audit.py` on `{sf_dir}`. ")
    out.write("Columns: parquet scans / filters pushed to the scan / "
              "columns actually read per scan (pruning) / join strategies / "
              "WholeStageCodegen spans / shuffles / Arrow-Python stages.\n\n")
    out.write("| query | scans | pushed | read cols/scan | bcast | shuffle-join | BNLJ | codegen | exchanges | py-arrow |\n")
    out.write("|---|---|---|---|---|---|---|---|---|---|\n")
    details = []
    for name in AUDITED:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = plan_text(df)
        s = summarize(plan)
        out.write(
            f"| {name} | {s['scans']} | {len(s['pushed_filters'])} | "
            f"{s['read_cols']} | {s['broadcast_joins']} | {s['shuffle_joins']} | "
            f"{s['bnl_joins']} | {s['codegen_spans']} | {s['exchanges']} | {s['python_udf']} |\n"
        )
        if s["pushed_filters"]:
            details.append(f"### {name}\nPushed: " + "; ".join(
                f"`[{p}]`" for p in s["pushed_filters"]) + "\n")
    out.write("\nNotes:\n")
    out.write("- `cosine_topk`'s BroadcastNestedLoopJoin is the intended "
              "broadcast of the small query side (exact ANN baseline); the "
              "LSH variants replace it at scale.\n")
    out.write("- Arrow-Python stages appear only where SURVEY.md §2 calls "
              "for vectorized UDFs (token ops); relational operators stay "
              "JVM-side.\n")
    out.write("- `ngram_jaccard_pairs` / `minhash_lsh_dedup` cache their "
              "shingle/signature frame (it feeds 3-4 consumers); this "
              "STATIC explain inlines the cached lineage into every "
              "consumer, so their scan/exchange counts here are the "
              "pre-cache worst case — at runtime the InMemoryRelation "
              "collapses them to one scan. Same for `p0_full_assembly`'s "
              "run-entity cache (verified: executed plan shows 1 parquet "
              "scan + 3 InMemoryTableScans).\n")
    out.write("- codegen ids are assigned at execution time under AQE, so "
              "adaptive plans report 0 here; non-adaptive plans (e.g. "
              "token_pipeline) show their spans. Shuffle/broadcast columns "
              "are the static pre-AQE choice.\n\n")
    out.write("\n".join(details))
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(out.getvalue())
    print(out.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
