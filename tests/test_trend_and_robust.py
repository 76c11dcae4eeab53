"""Unit tests for trend_slopes, winsorized_stats, and hard_negatives."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def test_trend_slopes_recovers_known_line(spark):
    from dlt_spark.dataops.timeseries import trend_slopes

    # key 1: value = 2.0 * days + 5.0 exactly; key 2: constant timestamps
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        rows.append((1, base + dt.timedelta(days=d), 5.0 + 2.0 * d))
    rows.append((2, base, 1.0))
    rows.append((2, base, 9.0))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["k"]: r for r in trend_slopes(df, "k", "ts", "v").collect()}
    assert out[1]["slope"] == pytest.approx(2.0, abs=1e-6)
    assert out[1]["intercept"] == pytest.approx(5.0, abs=1e-6)
    # zero x-variance key is dropped, not NaN/inf
    assert 2 not in out


def test_trend_slopes_partitioning_invariant(spark):
    from dlt_spark.dataops.timeseries import trend_slopes

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i % 5, base + dt.timedelta(hours=i * 7 % 97), float((i * 13) % 29))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    a = sorted(map(tuple, trend_slopes(df, "k", "ts", "v").collect()))
    b = sorted(
        map(tuple, trend_slopes(df.repartition(7, "v"), "k", "ts", "v").collect())
    )
    assert a == b


def test_winsorized_stats_clips_outliers(spark):
    from dlt_spark.dataops.profiling import winsorized_stats

    # 99 well-behaved values + one absurd outlier: the winsorized mean
    # must sit near the bulk, the plain mean far above it
    rows = [("a", float(i % 10)) for i in range(99)] + [("a", 1e6)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = winsorized_stats(df, "g", "v").collect()[0]
    plain_mean = df.agg(F.avg("v")).collect()[0][0]
    assert plain_mean > 1000
    # p99 with n=100 interpolates 1% of the way toward the outlier
    # (~10k), so the winsorized mean lands near 100 — two orders of
    # magnitude below the plain mean the outlier drags to ~10000
    assert r["wins_mean"] < plain_mean / 50
    assert r["wins_std"] < plain_mean / 5
    assert 0 <= r["mad"] <= 5
    assert r["n"] == 100


def test_winsorized_stats_partitioning_invariant(spark):
    from dlt_spark.dataops.profiling import winsorized_stats

    rows = [(f"g{i % 3}", math.sin(i) * 100 + i % 7) for i in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    a = sorted(map(tuple, winsorized_stats(df, "g", "v").collect()))
    b = sorted(
        map(tuple, winsorized_stats(df.repartition(11, "v"), "g", "v").collect())
    )
    assert a == b


def test_hard_negatives_excludes_same_label_and_self(spark):
    from dlt_spark.dataops.similarity import hard_negatives

    # vectors on a circle; labels alternate — nearest different-label
    # vector is the angular neighbour of opposite parity
    rows = []
    for i in range(12):
        ang = i * math.pi / 6
        rows.append((i, [math.cos(ang), math.sin(ang)], i % 2))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    anchors = df.filter(F.col("vec_id") < 2)
    out = hard_negatives(df, anchors, k=3).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for aid, negs in by_anchor.items():
        assert len(negs) == 3
        assert [n["rank"] for n in negs] == [1, 2, 3]
        for n in negs:
            assert n["negative_id"] != aid
            # negative label differs from the anchor's
            assert (n["negative_id"] % 2) != (aid % 2)
    # anchor 0 (label 0): closest odd-labelled vectors are ids 1 and 11
    top2 = {n["negative_id"] for n in by_anchor[0][:2]}
    assert top2 == {1, 11}


def test_hard_negatives_min_cosine_prunes(spark):
    from dlt_spark.dataops.similarity import hard_negatives

    rows = []
    for i in range(12):
        ang = i * math.pi / 6
        rows.append((i, [math.cos(ang), math.sin(ang)], i % 2))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    anchors = df.filter(F.col("vec_id") == 0)
    out = hard_negatives(df, anchors, k=10, min_cosine=0.4).collect()
    assert all(r["cosine"] >= 0.4 for r in out)
    # odd-labelled vectors sit at 30, 90, 150, ... degrees from anchor 0;
    # only the 30-degree pair (ids 1 and 11, cos ~0.866) clears 0.4
    assert {r["negative_id"] for r in out} == {1, 11}


def test_random_projection_preserves_distances(spark):
    """JL property: relative pairwise distances survive 64->16 within a
    loose tolerance, and the output is engine-deterministic."""
    import math
    import random as rnd

    from dlt_spark.dataops.similarity import random_projection

    r = rnd.Random(7)
    rows = [(i, [r.gauss(0, 1) for _ in range(64)]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = {x["vec_id"]: x["rp_embedding"]
            for x in random_projection(df, 64, 16).collect()}
    orig = {i: v for i, v in rows}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for i in range(6):
        for j in range(i + 1, 6):
            d0 = dist(orig[i], orig[j])
            d1 = dist(proj[i], proj[j])
            ratios.append(d1 / d0)
    # with 16 output dims the distortion is bounded in practice; the
    # point is "same scale", not a tight epsilon
    assert 0.4 < min(ratios) and max(ratios) < 1.8, ratios
    # determinism across partitionings
    again = {x["vec_id"]: x["rp_embedding"]
             for x in random_projection(df.repartition(5), 64, 16).collect()}
    assert again == proj


def test_ab_welch_matches_reference_formula(spark):
    import math

    from dlt_spark.dataops.profiling import ab_welch_test

    a = [10.0, 12.0, 11.0, 13.0, 9.0]
    b = [14.0, 15.0, 13.5, 16.0, 14.5, 15.5]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "variant string, value double")
    out = ab_welch_test(df, "variant", "value", control="a").collect()
    assert len(out) == 1
    r = out[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se = va / len(a) + vb / len(b)
    t = (mb - ma) / math.sqrt(se)
    dof = se * se / ((va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1))
    assert abs(r["t_nano"] / 1e9 - t) < 1e-6
    assert abs(r["dof_nano"] / 1e9 - dof) < 1e-6
    assert abs(r["uplift"] - round(mb - ma, 6)) < 1e-9
    assert r["n_c"] == 5 and r["n_v"] == 6
