"""Unit tests for exact AUC and calibration bins."""

import pytest


def test_auc_perfect_separation(spark):
    from dlt_spark.dataops.evalmetrics import binary_auc

    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["score", "y"])
    r = binary_auc(df, "score", "y").collect()[0]
    assert r["auc"] == 1.0 and r["n_pos"] == 5 and r["n_neg"] == 5


def test_auc_random_is_half_and_ties_count_half(spark):
    from dlt_spark.dataops.evalmetrics import binary_auc

    # every score identical: all pairs are ties -> AUC exactly 0.5
    df = spark.createDataFrame(
        [(1.0, i % 2 == 0) for i in range(20)], ["score", "y"]
    )
    assert binary_auc(df, "score", "y").collect()[0]["auc"] == 0.5


def test_auc_matches_bruteforce(spark):
    import random as rnd

    from dlt_spark.dataops.evalmetrics import binary_auc

    r = rnd.Random(3)
    rows = [(round(r.gauss(1.0 if r.random() < 0.4 else 0.0, 1.0), 2),) for _ in range(300)]
    data = [(s[0], s[0] + r.gauss(0, 0.5) > 0.7) for s in rows]
    df = spark.createDataFrame(data, ["score", "y"])
    got = binary_auc(df, "score", "y").collect()[0]["auc"]
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    won = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (won + ties / 2) / (len(pos) * len(neg))
    assert got == pytest.approx(expect, abs=1e-9)


def test_auc_partitioning_invariant(spark):
    from dlt_spark.dataops.evalmetrics import binary_auc

    data = [(float((i * 13) % 29) / 7.0, (i * 7) % 3 == 0) for i in range(500)]
    df = spark.createDataFrame(data, ["score", "y"])
    a = binary_auc(df, "score", "y").collect()[0]
    b = binary_auc(df.repartition(9, "score"), "score", "y").collect()[0]
    assert tuple(a) == tuple(b)


def test_calibration_bins_edges_and_rates(spark):
    from dlt_spark.dataops.evalmetrics import calibration_bins

    # scores -6 (clamps to bin 0), -4.5 -> bin 0, 0.5 -> bin 5, 7 -> bin 9
    df = spark.createDataFrame(
        [(-6.0, False), (-4.5, False), (0.5, True), (0.7, False), (7.0, True)],
        ["score", "y"],
    )
    out = {r["bin"]: r for r in calibration_bins(df, "score", "y").collect()}
    assert out[0]["n"] == 2 and out[0]["pos_rate"] == 0.0
    assert out[5]["n"] == 2 and out[5]["pos_rate"] == 0.5
    assert out[9]["n"] == 1 and out[9]["pos_rate"] == 1.0
    assert out[5]["mean_score"] == pytest.approx(0.6, abs=1e-6)


def test_pool_embeddings_exact_means(spark):
    from dlt_spark.dataops.vector import pool_embeddings

    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 4.0]),
            ("b", [10.0, 20.0]),
        ],
        ["g", "embedding"],
    )
    out = {r["g"]: r for r in pool_embeddings(df, "g").collect()}
    assert out["a"]["pooled"] == [2.0, 3.0]
    assert out["a"]["n_vectors"] == 2
    assert out["b"]["pooled"] == [10.0, 20.0]
    # partitioning invariance (decimal sums + struct sort)
    again = {r["g"]: r for r in
             pool_embeddings(df.repartition(4), "g").collect()}
    assert {k: v["pooled"] for k, v in again.items()} == {
        k: v["pooled"] for k, v in out.items()
    }


def test_binary_auc_single_class_is_null_not_nan(spark):
    from dlt_spark.dataops.evalmetrics import binary_auc

    df = spark.createDataFrame([(0.2, 1), (0.9, 1)], "s double, y int")
    row = binary_auc(df, "s", "y").collect()[0]
    assert row["n_pos"] == 2 and row["n_neg"] == 0
    assert row["auc"] is None
