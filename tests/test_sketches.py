"""HyperLogLog sketch tests: accuracy, mergeability, determinism."""

import pytest
from pyspark.sql import functions as F

from dlt_spark.dataops.sketches import (
    hll_count_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_std_error,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 20k values, each duplicated 3x: true distinct = 20000
    return spark.range(0, 60000).select((F.col("id") % 20000).alias("v"))


def test_estimate_within_expected_error(spark, ids):
    est = hll_count_distinct(ids, "v", p=8)
    err = abs(est - 20000) / 20000
    assert err < 3 * hll_std_error(8)  # 3 sigma ≈ 19.5% for p=8


def test_higher_p_tightens(spark, ids):
    est = hll_count_distinct(ids, "v", p=12)
    assert abs(est - 20000) / 20000 < 3 * hll_std_error(12)  # ≈ 4.9%


def test_merge_equals_sketch_of_union(spark, ids):
    a = ids.filter(F.col("v") < 12000)
    b = ids.filter(F.col("v") >= 8000)  # overlapping halves
    merged = hll_merge(hll_sketch(a, "v", p=8), hll_sketch(b, "v", p=8))
    whole = hll_sketch(ids, "v", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_deterministic_across_partitionings(spark, ids):
    e1 = hll_count_distinct(ids.repartition(1), "v", p=8)
    e2 = hll_count_distinct(ids.repartition(17), "v", p=8)
    assert e1 == e2


def test_small_range_linear_counting(spark):
    few = spark.range(0, 30).select(F.col("id").alias("v"))
    est = hll_count_distinct(few, "v", p=8)
    assert abs(est - 30) / 30 < 0.35  # linear-counting branch, small n


def test_cms_never_underestimates_and_is_tight_for_heavy(spark):
    from pyspark.sql import functions as F

    from dlt_spark.dataops.sketches import cms_estimate, cms_sketch

    # 3 heavy users + 200 light ones
    rows = [(1,)] * 500 + [(2,)] * 300 + [(3,)] * 100 + [(100 + i,) for i in range(200)]
    df = spark.createDataFrame(rows, ["uid"])
    sk = cms_sketch(df, "uid", depth=4, width=256)
    users = df.select("uid").distinct()
    est = {r["uid"]: r["est_count"] for r in cms_estimate(sk, users, "uid", depth=4, width=256).collect()}
    exact = {r["uid"]: r["n"] for r in df.groupBy("uid").agg(F.count("*").alias("n")).collect()}
    for u, n in exact.items():
        assert est[u] >= n                     # CMS never underestimates
    # heavy hitters are within the 2N/width additive bound with room
    n_total = len(rows)
    for u in (1, 2, 3):
        assert est[u] - exact[u] <= 2 * n_total / 256 + 1


def test_cms_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from dlt_spark.dataops.sketches import cms_merge, cms_sketch

    rows = [(i % 50,) for i in range(3000)]
    df = spark.createDataFrame(rows, ["uid"])
    whole = cms_sketch(df, "uid", depth=4, width=128)
    merged = cms_merge(
        cms_sketch(df.filter("uid < 25"), "uid", depth=4, width=128),
        cms_sketch(df.filter("uid >= 25"), "uid", depth=4, width=128),
    )
    w = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m
