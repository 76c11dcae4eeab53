"""Dump formatted physical plans for the headline queries to PLANS.md —
the plan-quality audit trail (PushedFilters, broadcasts, codegen spans,
shuffle counts) without needing to run Spark.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

# rest_incremental executes its E2E pipeline side effects when called —
# the audited plan is the FINAL READ over the loaded store (the query's
# return value), which is the scan a downstream consumer pays.  The
# store is a fresh tempfile.mkdtemp per call (see _q_rest_incremental),
# so repeated audits never accumulate or mutate shared state.
# stream_dedup is special-cased below: a streaming DataFrame cannot be
# executed-planned pre-start, so its PRE-START plan is captured via
# explain(extended) on __spark_entry__._stream_dedup_df.
AUDIT = [
    "model_chain",
    "rest_incremental",
    "stream_dedup",
    "normalize_explode",
    "relation_ops",
    "relation_join_chain",
    "sessionization",
    "window_running_sum",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "rolling_fingerprint",
    "pipeline_load_events",
    "time_bucket_rollup",
    "stats_summary",
    "tfidf_top_terms",
    "dup_clusters",
    "remove_boilerplate",
    "hash_split",
    "event_deltas",
    "dedup_containment",
    "interval_join",
    "profile_table",
    "value_histogram",
    "video_frame_sample",
    "tpch_q12",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q19",
    "tpch_q20",
    "pagerank",
    "random_projection",
    "binary_auc",
    "calibration",
    "retrieval_recall",
    "pool_embeddings",
    "decayed_engagement",
    "rolling_active_users",
    "leakage_safe_split",
    "char_entropy",
    "rater_agreement",
    "best_of_n",
    "skipgram_pairs",
    "ab_welch",
    "label_spread",
    "clustering_coeff",
    "clustering_coeff_capped",
    "k_anonymity",
    "l_diversity",
    "image_resize",
    "audio_features",
    "kcore_decomposition",
    "degree_assortativity",
    "bpe_train_merges",
    "window_funcs",
    "table_changes",
    "source_overlap_matrix",
    "kmeans_lloyd",
    "source_centroid_sim",
    "link_prediction",
    "stream_sessions",
    "stream_windowed_counts",
    "nb_source_classifier",
    "embedding_covariance",
    "ngram_diversity",
    "blocklist_filter",
    "bpe_encode",
    "embedding_quantize",
    "ngram_novelty",
    "boundary_overlap",
    "scd2_point_in_time",
    "scd2_partial",
    "bpe_token_count",
    "chunk_text_lateral",
    "coercions",
    "corpus_diff",
    "k_anonymity_stats",
    "lang_id",
    "length_batches",
    "linear_attribution",
    "multimodal_features",
    "row_counts",
    "sql_query",
    "text_fingerprint",
    "text_quality",
    "variant_split",
    "zipf_slope",
    "langid_confusion",
    "merge_insert_only",
    "merge_hard_delete",
    "replace",
    "pipeline_e2e",
    "grouping_sets",
    "cube_agg",
    "set_ops",
    "variant_type_json",
    "outer_join_counts",
    "distinct_agg",
    "rollup_agg",
    "incremental_lag",
    "incremental_backfill",
    "incremental_boundary_dedup",
    "similarity_lsh_topk",
    "embedding_dup_pairs",
    "dedup_simhash",
    "bt_preference",
    "conversations",
    "bpe_top_pairs",
    "dsir_weights",
    "template_dedup",
    "diverse_sample",
    "triangle_census",
    "token_pmi",
    "source_percentiles",
    "hits_scores",

    "incremental_cursor",
    "merge_delete_insert",
    "merge_upsert",
    "scd2",
    "normalize_flatten",
    "normalize_nested_roundtrip",
    "tpch_q1",
    "tpch_q3",
    "text_metrics",
    "dedup_minhash_lsh",
    "similarity_topk",
    "asof_join",
    "range_join",
    "repetition_signals",
    "pii_redaction",
    "gopher_filter",
    "curate_corpus",
    "decontamination",
    "sequence_packing",
    "stratified_sample",
    "topk_per_group",
    "tpch_q5",
    "pivot_agg",
    "dedup_incremental",
    "per_source_cap",
    "clean_text",
    "hll_distinct",
    "ivf_topk",
    "quality_probe",
    "incremental_rollup",
    "event_funnel",
    "quality_tiers",
    "corpus_mix",
    "chunk_documents",
    "cross_doc_repetition",
    "sample_exact_k",
    "tpch_q6",
    "tpch_q10",
    "tpch_q2",
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
    "unigram_logprob",
    "semantic_dedup",
    "cohort_retention",
    "zscore_outliers",
    "exact_percentiles",
    "bm25_search",
    "hll_group_distinct",
    "cms_heavy_hitters",
    "remove_repeated_spans",
    "quantile_sketch",
    "quantile_sketch_grouped",
    "mix_temperature",
    "salted_join_agg",
    "dedup_corpus_lines",
    "canonical_docs",
    "vocab_coverage",
    "pq_topk",
    "epoch_shuffle",
    "shard_manifest",
    "attribution",
    "distribution_drift",
    "skew_diagnostics",
    "bigram_logprob",
    "fuzzy_pairs",
    "gap_fill",
    "rolling_anomalies",
    "variant_shred",
    "event_transitions",
    "rfm_segments",
    "weighted_sample",
    "hard_negatives",
    "winsorized_stats",
    "trend_slopes",
    "dq_report",
    "hybrid_search",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("explain_audit")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    out = [
        "# PLANS — physical plan audit of headline queries",
        "",
        f"Generated by `tools/explain_audit.py` at {sf_dir}. Inspect for:",
        "`PushedFilters` (predicate pushdown), `ReadSchema` (column pruning),",
        "`BroadcastHashJoin` (no big-side shuffles for key-set joins),",
        "`*(n)` spans (WholeStageCodegen), `Exchange` count (shuffles).",
        "",
    ]
    # streaming pre-start plan: explain(extended)'s physical section
    # (executedPlan raises on unstarted streaming sources)
    def _streaming_plan(df) -> str:
        full = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "extended"
        )
        return full.split("== Physical Plan ==")[-1].strip()

    for name in AUDIT:
        if name == "stream_dedup":
            sdf = entry._stream_dedup_df(spark, sf_dir)
            plan = "(pre-start streaming plan)\n" + _streaming_plan(sdf)
            plan = re.sub(r"#\d+L?", "", plan)
            out.append(f"## {name}")
            out.append(
                f"shuffles(Exchange)={plan.count('Exchange')}"
                f" · stateful ops={plan.count('StreamingDeduplicate')}"
                " · state bounded by watermark delay"
            )
            out.append("```")
            out.append(plan[:4000].rstrip())
            out.append("```")
            out.append("")
            continue
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip plan ids for stable diffs
        plan = re.sub(r"#\d+L?", "", plan)
        exchanges = plan.count("Exchange")
        broadcasts = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoop")
        pushed = "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan)
        out.append(f"## {name}")
        out.append(
            f"shuffles(Exchange)={exchanges} · broadcast joins={broadcasts}"
            f" · scan-pushed filters={'yes' if pushed else 'none'}"
        )
        out.append("```")
        out.append(plan[:4000].rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDIT)} queries)")


if __name__ == "__main__":
    main()
