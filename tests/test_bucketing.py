"""Bucketed co-located joins: the write-time shuffle removes the
read-time Exchange — pinned on the physical plan."""

import pytest
from pyspark.sql import functions as F

from dlt_spark.store.bucketing import bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    write_bucketed(orders, "b_orders", "o_key", 8, path=str(tmp_path / "bo"))
    write_bucketed(lines, "b_lines", "l_key", 8, path=str(tmp_path / "bl"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a = bucketed(spark, "b_orders")
    b = bucketed(spark, "b_lines")
    # small test tables would broadcast (which also skips the shuffle);
    # force the sort-merge path to pin the BUCKETED no-Exchange plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a["o_key"] == b["l_key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 6000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_exchange(spark, tmp_path):
    # control: the same join over plain parquet shuffles both sides
    orders = spark.range(0, 2000).select(F.col("id").alias("o_key"))
    lines = spark.range(0, 6000).select((F.col("id") % 2000).alias("l_key"))
    op, lp = str(tmp_path / "po"), str(tmp_path / "pl")
    orders.write.parquet(op)
    lines.write.parquet(lp)
    a = spark.read.parquet(op)
    b = spark.read.parquet(lp)
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a["o_key"] == b["l_key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_pair):
    b = bucketed(spark, "b_lines")
    agg = b.groupBy("l_key").agg(F.sum("l_val").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_bucketed_join_correctness_vs_plain(spark, bucketed_pair):
    a = bucketed(spark, "b_orders")
    b = bucketed(spark, "b_lines")
    got = (
        a.join(b, a["o_key"] == b["l_key"])
        .groupBy("o_val")
        .agg(F.count("*").alias("n"), F.sum("l_val").alias("s"))
        .orderBy("o_val")
        .collect()
    )
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    want = (
        orders.join(lines, orders["o_key"] == lines["l_key"])
        .groupBy("o_val")
        .agg(F.count("*").alias("n"), F.sum("l_val").alias("s"))
        .orderBy("o_val")
        .collect()
    )
    assert got == want
