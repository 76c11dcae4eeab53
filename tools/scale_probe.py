"""Scaling-curve probe: measure flagship queries at sf0.01 / sf0.1 and
at synthetic 10x / 100x replicas of sf0.1, then report per-query scaling
exponents (slope of log-time vs log-rows).

The correctness gate runs at small SF; this is the evidence that the
plans HOLD as data grows: a scan-shaped operator should show exponent
~1.0 (linear), candidate-generation dedup stays near-linear because
bucketing bounds the pair space, and nothing should go quadratic.

Replica construction (per factor F, under /tmp/dlt_spark_scale/sfx{F}):
- documents: doc_id shifted per replica; text gets a replica-tag token
  appended so replicas are NEAR-duplicates (realistic dedup load, not
  degenerate exact-copy explosion); source/lang kept (stratification
  cardinality unchanged).
- events: event_id/user_id shifted; ts shifted by replica-days so the
  time spine grows with data (gap_fill/sessionization realism).
- embeddings: vec_id shifted, vectors UNCHANGED -> every LSH bucket gets
  F co-located near-identical members: a deliberate hot-bucket stress of
  the bucket-cap guards.
- lineitem/orders: keys shifted jointly so join fan-out is preserved.

Usage: python tools/scale_probe.py [--factors 10,100] [--queries a,b,c]
Writes SCALE.md in the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/dlt_spark_scale"

# the 100-TB-story subset: corpus curation, dedup, LM scoring, export,
# search, time series, analytics joins
PROBE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "curate_corpus",
    "decontamination",
    "dup_clusters",
    "dedup_incremental",
    "dedup_corpus_lines",
    "remove_repeated_spans",
    "unigram_logprob",
    "bigram_logprob",
    "sequence_packing",
    "epoch_shuffle",
    "bm25_search",
    "gap_fill",
    "attribution",
    "sessionization",
    "tpch_q1",
    "tpch_q5",
    "tpch_q10",
    "tpch_q18",
    "semantic_dedup",
    "ivf_topk",
    "pq_topk",
    "hard_negatives",
    "winsorized_stats",
    "trend_slopes",
    "hll_group_distinct",
    "quantile_sketch_grouped",
    "rfm_segments",
    "event_transitions",
    "merge_upsert",
    "scd2",
    "normalize_explode",
    "fuzzy_pairs",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_replica(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"{SCRATCH}/sfx{factor}"
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("_rep"))
    for t in TABLES:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in ("region", "nation", "customer", "supplier", "part"):
            # dimensions keep their cardinality (broadcast sides stay small)
            df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
            continue
        x = df.crossJoin(rep)
        if t == "documents":
            shift = F.col("_rep") * F.lit(10_000_000)
            x = x.select(
                (F.col("doc_id") + shift).alias("doc_id"),
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("_rep").cast("string"))
                ).alias("text"),
                "lang", "source",
                F.col("n_chars").alias("n_chars"),
            )
        elif t == "events":
            shift = F.col("_rep") * F.lit(100_000_000)
            x = x.select(
                (F.col("event_id") + shift).alias("event_id"),
                (F.col("ts") + F.make_interval(days=F.col("_rep").cast("int") * 40)).alias("ts"),
                (F.col("user_id") + F.col("_rep") * F.lit(1_000_000)).alias("user_id"),
                "event_type", "value", "props",
            )
        elif t == "embeddings":
            x = x.select(
                (F.col("vec_id") + F.col("_rep") * F.lit(10_000_000)).alias("vec_id"),
                "embedding", "label",
            )
        elif t == "orders":
            shift = F.col("_rep") * F.lit(1_000_000_000)
            x = x.select(
                (F.col("o_orderkey") + shift).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
                *[c for c in df.columns if c not in (
                    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")],
            )
        elif t == "lineitem":
            shift = F.col("_rep") * F.lit(1_000_000_000)
            x = x.select(
                (F.col("l_orderkey") + shift).alias("l_orderkey"),
                *[c for c in df.columns if c != "l_orderkey"],
            )
        x.drop("_rep").write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    return out_dir


def bench_dir(spark, sf_dir: str, names, timings: dict) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            timings[name] = (round(dt, 2), n)
            print(f"#   {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        except Exception as ex:
            timings[name] = (None, f"{type(ex).__name__}: {ex}"[:200])
            print(f"#   {name}: FAILED {ex}", file=sys.stderr)
        try:
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(True)
        except Exception:
            pass


def main() -> None:
    factors = [10, 100]
    names = PROBE
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--queries"):
            names = a.split("=", 1)[1].split(",")

    # same JVM-launch sizing as bench.py (merge — the container may
    # pre-set SPARK_SUBMIT_OPTS with unrelated -D flags)
    _opts = os.environ.get("SPARK_SUBMIT_OPTS", "")
    if "ReservedCodeCacheSize" not in _opts:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            _opts + " -XX:ReservedCodeCacheSize=512m"
        ).strip()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dlt_spark_scale_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        # PySpark 4's per-call error-origin capture does 2-4 extra py4j
        # round-trips for EVERY Column/function call (conf lookup + call
        # site push); on a 169-query sweep that is millions of messages
        # of pure driver latency.  Debug-only feature, no result or plan
        # impact (r10: F.col 26 -> 3 py4j commands, query construction
        # ~3x fewer messages).  A production pipeline disables it too.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(int(cpus) * 4).repartition(int(cpus)).select(_warm("id")).count()

    tiers = [("sf0.01", "/root/testdata/sf0.01", 0.01), ("sf0.1", BASE, 0.1)]
    for f in factors:
        print(f"# building {f}x replica ...", file=sys.stderr)
        t0 = time.time()
        d = build_replica(spark, f)
        print(f"# built in {time.time()-t0:.1f}s", file=sys.stderr)
        tiers.append((f"sfx{f}", d, 0.1 * f))

    results: dict = {}
    for tag, d, sf in tiers:
        print(f"# --- {tag} ({d}) ---", file=sys.stderr)
        results[tag] = {}
        bench_dir(spark, d, names, results[tag])

    # scaling exponent: slope of log(time) vs log(sf) over the tiers
    # where the query succeeded, using the two largest tiers (the small
    # ones are fixed-overhead dominated)
    sfs = {tag: sf for tag, _, sf in tiers}
    report = {}
    for name in names:
        pts = [
            (sfs[tag], results[tag][name][0])
            for tag, _, _ in tiers
            if results[tag].get(name) and results[tag][name][0]
        ]
        if len(pts) >= 2:
            (x1, t1), (x2, t2) = pts[-2], pts[-1]
            exp = math.log(t2 / t1) / math.log(x2 / x1)
            report[name] = round(exp, 2)

    # full boilerplate header only once per file — appended batches get
    # a short dated sub-heading (SCALE.md was accumulating one identical
    # header block per probe run)
    out_path = os.path.join(HERE, "SCALE.md")
    custom = any(a.startswith("--queries") for a in sys.argv[1:])
    have_header = False
    if custom:  # append mode only — a full (w-mode) run rewrites the file
        try:
            with open(out_path) as f:
                have_header = "# SCALE — scaling-curve probe" in f.read()
        except OSError:
            pass
    if have_header:
        lines = ["## probe batch (local[%s])" % cpus, ""]
    else:
        lines = ["# SCALE — scaling-curve probe (tools/scale_probe.py)", ""]
        lines.append(
            "Wall-clock per query on local[%s] over sf0.01, sf0.1, and synthetic "
            "replicas of sf0.1 (near-duplicate shifted-key copies; see the "
            "script docstring for construction).  `exp` = log-log slope "
            "between the two largest tiers — ~1.0 is linear scaling, <1 means "
            "fixed overhead still dominates, >1.3 deserves a look." % cpus
        )
        lines.append("")
    tags = [t for t, _, _ in tiers]
    lines.append("| query | " + " | ".join(tags) + " | exp |")
    lines.append("|---" * (len(tags) + 2) + "|")
    for name in names:
        row = [name]
        for tag in tags:
            v = results[tag].get(name)
            row.append(f"{v[0]}s" if v and v[0] is not None else "FAIL")
        row.append(str(report.get(name, "-")))
        lines.append("| " + " | ".join(row) + " |")
    # a custom --queries run is a batch probe: append the table to
    # SCALE.md instead of clobbering the accumulated findings
    mode = "a" if custom else "w"
    with open(os.path.join(HERE, "SCALE.md"), mode) as f:
        if custom:
            f.write("\n")
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"tiers": {t: {n: v[0] for n, v in r.items()} for t, r in results.items()},
                      "exponent": report}))


if __name__ == "__main__":
    main()
