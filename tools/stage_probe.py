"""Warm per-query *stage-level* breakdown — where inside one entry query
the time goes (guide §7.1's empirical loop, headless).

warm_ab.py answers "how long is the query warm"; this answers "which
jobs/stages inside it are the cost".  It runs the query cold once, then
warm reps, then queries the local Spark UI REST API (enabled just for
this probe; bench keeps the UI off) for every completed stage: stage
wall duration, executorRunTime, task count, shuffle read/write bytes,
and the stage name/call-site — enough to attribute a 5s query to its
exchanges, checkpoints, and codegen units.

Usage:  python tools/stage_probe.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    _opts = os.environ.get("SPARK_SUBMIT_OPTS", "")
    if "ReservedCodeCacheSize" not in _opts:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            _opts + " -XX:ReservedCodeCacheSize=512m"
        ).strip()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dlt_spark_stage_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
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
    sc = spark.sparkContext

    import __spark_entry__ as entry

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(int(cpus) * 4).repartition(int(cpus)).select(_warm("id")).count()

    qs = entry.queries()
    fn = qs[name]

    def _clean():
        spark.catalog.clearCache()
        jsc = sc._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)

    for r in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        print(f"# rep{r} {name}: {time.time() - t0:.2f}s rows={n}", flush=True)
        _clean()

    # instrumented warm rep
    app_id = sc.applicationId
    base = f"http://127.0.0.1:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1/applications/{app_id}"
    pre = {s["stageId"] for s in json.load(urllib.request.urlopen(f"{base}/stages"))}
    t0 = time.time()
    df = fn(spark, sf_dir)
    n = df.count()
    t_all = time.time() - t0
    print(f"# instrumented total={t_all:.2f}s rows={n}")
    stages = json.load(urllib.request.urlopen(f"{base}/stages"))
    new = [s for s in stages if s["stageId"] not in pre]
    new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    tot_run = sum(s.get("executorRunTime") or 0 for s in new)
    print(f"# {len(new)} stages, total executorRunTime={tot_run/1000.0:.2f}s (x{cpus} cores)")
    for s in new:
        dur = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            pass
        print(
            f"stage {s['stageId']}: status={s['status']} tasks={s['numCompleteTasks']}"
            f" runTime={(s.get('executorRunTime') or 0)/1000.0:.2f}s"
            f" cpuTime={(s.get('executorCpuTime') or 0)/1e9:.2f}s"
            f" shufR={(s.get('shuffleReadBytes') or 0)//1024}K"
            f" shufW={(s.get('shuffleWriteBytes') or 0)//1024}K"
            f" in={(s.get('inputBytes') or 0)//1024}K"
            f"  {s.get('name', '')[:110]}"
        )


if __name__ == "__main__":
    main()
