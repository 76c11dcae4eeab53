"""Deterministic sampling/splitting tests: reproducibility, partition
independence, rate accuracy, and split stability under growth."""

import pytest
from pyspark.sql import functions as F

from dlt_spark.dataops.sampling import deterministic_sample, hash_fraction, hash_split


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id"))


def test_sample_is_deterministic_and_partition_independent(spark, ids):
    a = sorted(r["id"] for r in deterministic_sample(ids, "id", 0.2).collect())
    b = sorted(r["id"] for r in deterministic_sample(ids.repartition(13), "id", 0.2).collect())
    assert a == b and len(a) > 0


def test_sample_rate_is_approximately_honored(ids):
    n = deterministic_sample(ids, "id", 0.3).count()
    assert 0.25 * 2000 < n < 0.35 * 2000


def test_nested_sample_rates(ids):
    # a lower-rate sample is a subset of a higher-rate one (same salt)
    lo = set(r["id"] for r in deterministic_sample(ids, "id", 0.1).collect())
    hi = set(r["id"] for r in deterministic_sample(ids, "id", 0.4).collect())
    assert lo < hi


def test_salt_decorrelates(ids):
    a = set(r["id"] for r in deterministic_sample(ids, "id", 0.2, salt="s1").collect())
    b = set(r["id"] for r in deterministic_sample(ids, "id", 0.2, salt="s2").collect())
    assert a != b


def test_hash_split_covers_and_is_stable_under_growth(spark, ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r["id"]: r["split"] for r in hash_split(ids, "id", w).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.75 * 2000 < n_train < 0.85 * 2000
    # rows keep their split when the dataset grows
    half = spark.range(0, 1000).select(F.col("id"))
    sub = {r["id"]: r["split"] for r in hash_split(half, "id", w).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_hash_split_rejects_bad_weights(ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, "id", {"a": 0.5, "b": 0.2})


def test_hash_fraction_range(spark, ids):
    row = ids.select(
        F.min(hash_fraction(F.col("id"))).alias("lo"),
        F.max(hash_fraction(F.col("id"))).alias("hi"),
    ).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0


def test_percentile_tiers_edge_inputs(spark):
    """Round-3 advice: tiles=1 and empty/all-null inputs must not crash."""
    from dlt_spark.dataops.sampling import percentile_tiers

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    one = percentile_tiers(df, "v", tiles=1)
    assert {r["tier"] for r in one.collect()} == {1}

    empty = spark.createDataFrame([], "id long, v double")
    assert percentile_tiers(empty, "v", tiles=4).count() == 0

    nulls = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    got = percentile_tiers(nulls, "v", tiles=4).collect()
    assert {r["tier"] for r in got} == {4}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="tiles"):
        percentile_tiers(df, "v", tiles=0)


def test_pack_sequences_zero_token_clamp(spark):
    """Round-3 advice: a zero/NULL-token doc must not straddle shard
    namespaces (end_seq >= begin_seq >= shard base)."""
    from dlt_spark.dataops.packing import pack_sequences, _SEQ_SHIFT

    df = spark.createDataFrame(
        [(1, 0), (2, 100), (3, None)], "id long, n long"
    )
    out = pack_sequences(df, "id", "n", seq_len=64, num_shards=4).collect()
    for r in out:
        assert r["n_tokens"] >= 1
        base = r["shard"] * _SEQ_SHIFT
        assert base <= r["begin_seq"] <= r["end_seq"] < base + _SEQ_SHIFT


def test_profile_handles_odd_column_names(spark):
    from dlt_spark.dataops.profiling import profile

    df = spark.createDataFrame([(1, "x")], "id long, `weird col'name` string")
    rows = {r["column"]: r for r in profile(df).collect()}
    assert set(rows) == {"id", "weird col'name"}
    assert rows["id"]["n_nulls"] == 0


def test_weighted_sample_k_properties(spark):
    from dlt_spark.dataops.sampling import weighted_sample_k

    rows = [(i, 1000000 if i < 10 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample_k(df, "doc_id", "w", k=20)
    ids = {r["doc_id"] for r in out.collect()}
    assert len(ids) == 20
    # the 10 heavy rows (1e6x weight) are essentially certain picks
    assert all(i in ids for i in range(10))
    # deterministic under repartition
    ids2 = {r["doc_id"] for r in
            weighted_sample_k(df.repartition(13), "doc_id", "w", k=20).collect()}
    assert ids == ids2
    # zero/null weights excluded
    df2 = spark.createDataFrame([(1, 0), (2, None), (3, 5)], "doc_id long, w int")
    assert {r["doc_id"] for r in
            weighted_sample_k(df2, "doc_id", "w", k=5).collect()} == {3}


def test_percentile_normalize_per_group(spark):
    from dlt_spark.dataops.sampling import percentile_normalize

    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", 5), ("b", 100)]
    df = spark.createDataFrame(rows, "g string, s long")
    out = percentile_normalize(df, "g", "s").collect()
    a = sorted(r["pct"] for r in out if r["g"] == "a")
    assert a == [0.0, 0.5, 1.0]
    b = [r["pct"] for r in out if r["g"] == "b"]
    assert sorted(b) == [0.0, 0.0, 1.0]  # ties share percent_rank


def test_leakage_safe_split_keeps_clusters_together(spark):
    from dlt_spark.dataops.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # clusters: {0..9} -> comp 0, {10,11} -> comp 10
    comp = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(10 + i, 10) for i in range(2)],
        "id long, component long",
    )
    out = leakage_safe_split(
        docs, "doc_id", comp, {"train": 0.6, "val": 0.2, "test": 0.2}
    ).collect()
    by_id = {r["doc_id"]: r["split"] for r in out}
    assert len({by_id[i] for i in range(10)}) == 1  # whole cluster together
    assert len({by_id[i] for i in (10, 11)}) == 1
    assert set(by_id.values()) <= {"train", "val", "test"}
    assert len(by_id) == 40
