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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

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

    qs = entry.queries()
    timings: dict = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        # warm the input file cache metadata, then time plan + execution
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wallclock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
