"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set (BASELINE.md): normalize of nested events (flatten+explode),
merge delete-insert on orders, upsert + scd2 on customer, incremental
lineitem scan by date cursor, Relation read ops, plus the beyond-reference
ops (dedup, similarity, text metrics) that define the 100 TB story.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "normalize_flatten",
    "normalize_explode",
    "merge_delete_insert",
    "merge_upsert",
    "scd2",
    "incremental_cursor",
    "relation_ops",
    "relation_join_chain",
    "tpch_q1",
    "sessionization",
    "window_running_sum",
    "text_metrics",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_topk",
    "normalize_nested_roundtrip",
    "tpch_q3",
    "rolling_fingerprint",
    "asof_join",
    "range_join",
    "pipeline_load_events",
    "time_bucket_rollup",
    "stats_summary",
    "tfidf_top_terms",
    "curate_corpus",
    "dup_clusters",
    "repetition_signals",
    "pii_redaction",
    "remove_boilerplate",
    "hash_split",
    "gopher_filter",
    "decontamination",
    "sequence_packing",
    "stratified_sample",
    "topk_per_group",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "pivot_agg",
    "dedup_incremental",
    "per_source_cap",
    "clean_text",
    "hll_distinct",
    "ivf_topk",
    "quality_probe",
    "incremental_rollup",
    "corpus_mix",
    "sample_exact_k",
    "chunk_documents",
    "cross_doc_repetition",
    "event_deltas",
    "dedup_containment",
    "interval_join",
    "profile_table",
    "value_histogram",
    "video_frame_sample",
    "event_funnel",
    "quality_tiers",
    "tpch_q2",
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
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
    "variant_type_json",
    "event_transitions",
    "rfm_segments",
    "weighted_sample",
    "hard_negatives",
    "winsorized_stats",
    "trend_slopes",
    "dq_report",
    "hybrid_search",
    "pagerank",
    "random_projection",
    "binary_auc",
    "calibration",
    "retrieval_recall",
    "pool_embeddings",
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
    "clustering_coeff",
    "best_of_n",
    "rater_agreement",
    "char_entropy",
    "leakage_safe_split",
    "label_spread",
    "ab_welch",
    "skipgram_pairs",
    "decayed_engagement",
    "rolling_active_users",
    "corpus_diff",
    "linear_attribution",
    "length_batches",
    "rest_incremental",
    "clustering_coeff_capped",
    "k_anonymity",
    "kcore_decomposition",
    "degree_assortativity",
    "bpe_train_merges",
    "window_funcs",
    "table_changes",
    "stream_windowed_counts",
    "stream_sessions",
    "source_overlap_matrix",
    "kmeans_lloyd",
    "source_centroid_sim",
    "link_prediction",
    "nb_source_classifier",
    "embedding_covariance",
    "ngram_diversity",
    "blocklist_filter",
    "bpe_encode",
    "embedding_quantize",
    "ngram_novelty",
    "boundary_overlap",
    "zipf_slope",
    "langid_confusion",
    "chunk_text_lateral",
    "stream_dedup",
    "scd2_point_in_time",
    "scd2_partial",
]

# Cheap tier: the registry queries OUTSIDE the headline set, timed once
# at sf0.01 in a separate JSON section — so a regression in, say, the
# merge family's non-default dispositions is visible round-over-round
# without inflating the headline total (which must stay comparable to
# prior rounds).  Together with BENCH_QUERIES this covers every
# queries() entry.
CHEAP_QUERIES = [
    "model_chain",
    "image_resize",
    "audio_features",
    "l_diversity",
    "k_anonymity_stats",
    "row_counts",
    "sql_query",
    "rollup_agg",
    "merge_insert_only",
    "merge_hard_delete",
    "replace",
    "incremental_lag",
    "incremental_backfill",
    "incremental_boundary_dedup",
    "coercions",
    "text_fingerprint",
    "lang_id",
    "embedding_dup_pairs",
    "set_ops",
    "cube_agg",
    "variant_split",
    "text_quality",
    "bpe_token_count",
    "dedup_simhash",
    "similarity_lsh_topk",
    "multimodal_features",
    "pipeline_e2e",
    "distinct_agg",
    "grouping_sets",
    "outer_join_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    # ~160 queries x 5-20 codegen units each JIT-compiles far past the
    # default 240 MB ReservedCodeCacheSize (measured: the profiled
    # nmethods heap is half full after 40 SMALL queries) — once the code
    # cache saturates, the JVM flushes/deoptimizes hot methods and every
    # late query pays re-JIT, which is the single biggest source of
    # late-sweep inflation.  Must be set at JVM LAUNCH, so it goes
    # through SPARK_SUBMIT_OPTS before the gateway starts, not builder
    # config.  MERGE, don't setdefault: environments that pre-set
    # SPARK_SUBMIT_OPTS for unrelated -D flags (r9: the container
    # exported ivy options, the setdefault silently dropped the flag,
    # and the whole sweep re-paid JIT thrash at +32%) must still get
    # the code-cache sizing; an explicit external ReservedCodeCacheSize
    # wins.
    _opts = os.environ.get("SPARK_SUBMIT_OPTS", "")
    if "ReservedCodeCacheSize" not in _opts:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            _opts + " -XX:ReservedCodeCacheSize=512m"
        ).strip()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dlt_spark_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # the generated-class cache defaults to 100 entries; ~100 queries x
        # 5-20 codegen units each evicts everything, so late queries pay a
        # full Janino recompile + fresh C2 JIT of every stage (measured:
        # curate_corpus 6.6s in a short session vs 14.6s late in the full
        # sweep).  A real long-lived cluster session would size this up too.
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        # PySpark 4's per-call error-origin capture does 2-4 extra py4j
        # round-trips for EVERY Column/function call (conf lookup + call
        # site push); on a 169-query sweep that is millions of messages
        # of pure driver latency.  Debug-only feature, no result or plan
        # impact (r10: F.col 26 -> 3 py4j commands, query construction
        # ~3x fewer messages).  A production pipeline disables it too.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    # absorb one-time JVM/session init so per-query numbers reflect work
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # ...including the Python/Arrow UDF worker pool (first pandas_udf in a
    # session forks one worker per core and imports pandas in each)
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(int(cpus) * 4).repartition(int(cpus)).select(
        _warm("id")
    ).count()
    # ...and the rest of Spark's own operator machinery (r10, measurement
    # refinement — disclosed in OPTIMIZATION_r10.md): the first query to
    # touch the parquet reader/writer, shuffle write+read, sort-merge
    # join, hash/object aggregation, window exec, generate/explode,
    # broadcast build, TopK sort, or the streaming engine pays its C2
    # JIT inside that query's timer (measured on the r10 container: the
    # first five headline queries read 21.5s without this warmup and
    # 11.5s with it, identical code).  All warmup data is SYNTHETIC
    # (spark.range into a throwaway tempdir) — no testdata parquet is
    # read, nothing is cached or persisted, every timed query still
    # computes from its own inputs from scratch.
    import shutil
    import tempfile

    _wd = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        from pyspark.sql import Window as _W

        _base = spark.range(200_000).select(
            _F.col("id"),
            (_F.col("id") % 1000).alias("k"),
            _F.col("id").cast("string").alias("s"),
            _F.array(_F.col("id"), _F.col("id") + 1).alias("arr"),
        )
        _base.write.mode("overwrite").parquet(_wd)
        _p = spark.read.parquet(_wd)
        _w = _W.partitionBy("k").orderBy("id")
        (
            _p.withColumn("rn", _F.row_number().over(_w))
            .withColumn("x", _F.explode("arr"))
            .groupBy("k")
            .agg(_F.count(_F.lit(1)).alias("n"), _F.collect_list("x").alias("l"))
            .join(_p.select("k", "id").distinct(), "k")
            .join(
                _F.broadcast(spark.range(1000).select(_F.col("id").alias("k"))),
                "k",
                "left",
            )
            .selectExpr("k", "n", "size(l) sl", "id")
            .groupBy()
            .agg(_F.sum("k"), _F.sum("n"))
            .collect()
        )
        _p.select(_F.split("s", "").alias("cs")).select(
            _F.explode("cs")
        ).groupBy("col").count().orderBy(_F.desc("count")).limit(5).collect()
        _p.alias("a").join(_p.alias("b"), "id").select(
            _F.count(_F.lit(1))
        ).collect()
        _p.orderBy("s").limit(100).collect()
        # streaming engine + state store (the stream_* queries otherwise
        # pay StreamExecution/HDFSBackedStateStore JIT in-sweep)
        _sd = os.path.join(_wd, "stream_src")
        _ck = os.path.join(_wd, "stream_ck")
        spark.range(10_000).select(
            _F.col("id"),
            _F.timestamp_seconds(_F.col("id") % 100 + 1_700_000_000).alias("ts"),
        ).write.mode("overwrite").parquet(_sd)
        _sdf = (
            spark.readStream.schema("id bigint, ts timestamp").parquet(_sd)
            .withWatermark("ts", "10 seconds")
            .dropDuplicatesWithinWatermark(["id"])
            .groupBy(_F.window("ts", "30 seconds"))
            .count()
        )
        _sq = (
            _sdf.writeStream.format("noop")
            .option("checkpointLocation", _ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _sq.awaitTermination(120)
    except Exception as _ex:  # warmup must never kill the bench
        print(f"# warmup (machinery) failed: {_ex}", file=sys.stderr)
    finally:
        shutil.rmtree(_wd, ignore_errors=True)

    qs = entry.queries()
    timings: dict = {}
    errors: dict = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        # warm the input file cache metadata, then time plan + execution
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as ex:
            # one broken query must not hide the other 58 numbers (round
            # 2's bench was dead a whole round) — record, continue, and
            # exit non-zero with a loud banner at the end
            errors[name] = f"{type(ex).__name__}: {ex}"[:500]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        # drop blocks a query cached/checkpointed so memory pressure and
        # GC from one query cannot skew the ones after it.  BLOCKING
        # unpersist + an explicit GC keep the cleanup cost here, outside
        # the next query's timer (async cleanup measurably bled ~1s into
        # whichever query ran next).
        try:
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(True)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    # cheap tier: one sf0.01 pass over the non-headline registry queries
    # (or the headline sf_dir itself when no sf0.01 sibling exists)
    cheap_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(cheap_dir):
        cheap_dir = sf_dir
    try:
        cheap_sf = float(cheap_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        # data dir not named sf<NUM> — label the tier, don't abort the bench
        cheap_sf = None
    cheap_timings: dict = {}
    cheap_total = 0.0
    for name in CHEAP_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            df = fn(spark, cheap_dir)
            n = df.count()
        except Exception as ex:
            errors[name] = f"{type(ex).__name__}: {ex}"[:500]
            print(f"# cheap {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        dt = time.time() - t0
        cheap_timings[name] = round(dt, 3)
        cheap_total += dt
        print(f"# cheap {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        try:
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(True)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    prev_delta = _diff_vs_previous(timings, sf)
    result = {
        "metric": "headline_queries_total_wallclock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cheap_tier": {
            "sf": cheap_sf,
            "value": round(cheap_total, 3),
            "queries": cheap_timings,
        },
    }
    if prev_delta:
        result["prev_delta"] = prev_delta
    _diff_cheap_vs_previous(cheap_timings)
    if errors:
        result["errors"] = errors
    # the stdout line is the driver contract, but its tail capture can
    # truncate one huge JSON line (BENCH_r04.json came back parsed:null)
    # — persist the full object to a file too so the round's numbers
    # always survive
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_out.json"), "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except Exception as ex:
        print(f"# bench_out.json write failed: {ex}", file=sys.stderr)
    print(json.dumps(result))
    if errors:
        print(
            f"# BENCH FAILED: {len(errors)} of {len(errors) + len(timings)}"
            f" queries raised: {sorted(errors)}",
            file=sys.stderr,
        )
        sys.exit(1)


def _diff_cheap_vs_previous(cheap: dict) -> None:
    """Best-effort stderr diff of the cheap tier vs the previous
    bench_out.json — regression visibility for the 30 non-headline
    registry queries (always sf0.01, so no sf gating)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "bench_out.json")) as f:
            prev = json.load(f).get("cheap_tier", {}).get("queries", {})
    except Exception:
        return
    for name, now in sorted(cheap.items()):
        if name in prev and abs(now - prev[name]) >= 0.3:
            print(
                f"# cheap-diff {name}: {prev[name]:.2f}s -> {now:.2f}s",
                file=sys.stderr,
            )


def _diff_vs_previous(timings: dict, sf: float) -> dict:
    """Round-over-round regression visibility: diff against the newest
    BENCH_r*.json in the repo root.  Prints the human diff to stderr and
    returns {query: delta_sec} for the JSON line (``prev_delta``)."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(_re.search(r"_r(\d+)", p).group(1)),
    )
    # candidates newest-driver-record first; bench_out.json (written by
    # the previous run, not yet overwritten — this diff runs before
    # main() writes) backstops a truncated driver capture (BENCH_r04.json
    # recorded parsed:null)
    candidates = list(reversed(benches))
    fallback = os.path.join(here, "bench_out.json")
    if os.path.exists(fallback):
        candidates.append(fallback)
    prev_q: dict = {}
    tag = ""
    for prev_path in candidates:
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            # driver wraps the line in metadata on some rounds
            if "queries" not in prev and "tail" in prev:
                m = _re.search(r'\{"metric".*\}', prev.get("tail", ""))
                prev = json.loads(m.group(0)) if m else {}
            if not isinstance(prev, dict):
                prev = {}
        except Exception as ex:  # diff is best-effort, never break the bench
            print(f"# bench-diff: could not read {prev_path}: {ex}", file=sys.stderr)
            continue
        q = prev.get("queries") or {}
        prev_sf = prev.get("sf")
        if q and prev_sf is not None and prev_sf != sf:
            print(
                f"# bench-diff: {os.path.basename(prev_path)} skipped"
                f" (prev sf={prev_sf}, now sf={sf})",
                file=sys.stderr,
            )
            continue
        if q:
            prev_q = q
            tag = os.path.basename(prev_path)
            break
    if not prev_q:
        return {}
    prev_total = sum(v for k, v in prev_q.items() if k in timings)
    now_total = sum(v for k, v in timings.items() if k in prev_q)
    print(
        f"# bench-diff vs {tag}: total {prev_total:.1f}s -> {now_total:.1f}s"
        f" ({(now_total - prev_total) / max(prev_total, 1e-9) * 100:+.0f}%)",
        file=sys.stderr,
    )
    deltas: dict = {}
    for name, now in sorted(
        timings.items(),
        key=lambda kv: kv[1] - prev_q.get(kv[0], kv[1]),
        reverse=True,
    ):
        if name not in prev_q:
            print(f"#   {name}: NEW {now:.2f}s", file=sys.stderr)
            continue
        delta = now - prev_q[name]
        deltas[name] = round(delta, 3)
        if abs(delta) >= 0.3:  # below that is session noise
            print(
                f"#   {name}: {prev_q[name]:.2f}s -> {now:.2f}s ({delta:+.2f}s)",
                file=sys.stderr,
            )
    return deltas


if __name__ == "__main__":
    main()
