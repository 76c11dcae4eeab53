"""Warm per-query A/B harness — the method of record for riser-cohort
attribution (SCALE.md "Riser cohort warm A/B" sections).

Cross-run sweep totals on this host are weather (identical code measured
136-232s within 40 min); the only trustworthy comparison is warm reps
inside ONE session with a bench-identical config.  Usage:

    python tools/warm_ab.py q1,q2,... [sf_dir] [reps]

Prints one row per query: all rep timings + the median.  Run with the
load average drained (see SCALE.md: reps taken under load read 1.5-2x).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # identical JVM-launch + session config to bench.py (incl. the merged
    # code-cache flag) so warm numbers are comparable to in-sweep ones
    _opts = os.environ.get("SPARK_SUBMIT_OPTS", "")
    if "ReservedCodeCacheSize" not in _opts:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            _opts + " -XX:ReservedCodeCacheSize=512m"
        ).strip()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dlt_spark_warm_ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
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

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(int(cpus) * 4).repartition(int(cpus)).select(_warm("id")).count()

    qs = entry.queries()
    la = os.getloadavg()
    print(f"# sf_dir={sf_dir} cpus={cpus} reps={reps} loadavg={la[0]:.2f}")
    for name in names:
        fn = qs[name]
        # warmup rep (codegen/JIT of this query's unique classes)
        fn(spark, sf_dir).collect()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        reps_s = "/".join(f"{t:.2f}" for t in times)
        print(f"{name}: median {med:.2f}s ({reps_s})")


if __name__ == "__main__":
    main()
