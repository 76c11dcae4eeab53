"""dbt-style SQL model DAG runner (dlt_spark/helpers/models.py —
Spark-native form of reference dlt/helpers/dbt/runner.py)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_topo_order_and_values(spark):
    from dlt_spark.helpers import run_model_chain

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    models = {
        # declared intentionally out of dependency order
        "mart_priority": """
            SELECT o_orderpriority, count(*) AS n, sum(big_total) AS sum_total
            FROM {{ ref('stg_big') }} GROUP BY o_orderpriority
        """,
        "stg_orders": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(o_totalprice AS DOUBLE) AS total
            FROM {{ source('orders') }}
        """,
        "stg_big": """
            SELECT o_orderkey, o_orderpriority, total AS big_total
            FROM {{ ref('stg_orders') }} WHERE total > 100000
        """,
    }
    out = run_model_chain(spark, models, sources={"orders": orders})
    assert set(out) == set(models)
    expected = (
        orders.selectExpr("o_orderpriority", "CAST(o_totalprice AS DOUBLE) AS t")
        .filter("t > 100000")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("t").alias("s"))
    )
    got = {r["o_orderpriority"]: (r["n"], r["sum_total"]) for r in out["mart_priority"].collect()}
    want = {r["o_orderpriority"]: (r["n"], r["s"]) for r in expected.collect()}
    assert got == want


def test_cycle_and_unknown_ref_raise(spark):
    from dlt_spark.helpers import ModelChainError, topo_order

    with pytest.raises(ModelChainError, match="cycle"):
        topo_order({
            "a": "SELECT * FROM {{ ref('b') }}",
            "b": "SELECT * FROM {{ ref('a') }}",
        })
    with pytest.raises(ModelChainError, match="unknown model"):
        topo_order({"a": "SELECT * FROM {{ ref('nope') }}"})


def test_model_named_like_source_view_raises(spark):
    # a model literally named src_<source> would land on the source's
    # temp-view name and silently shadow it — must raise instead
    from dlt_spark.helpers import ModelChainError, run_model_chain

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    models = {
        "src_orders": "SELECT 1 AS one",
        "mart": "SELECT count(*) AS n FROM {{ source('orders') }}",
    }
    with pytest.raises(ModelChainError, match="collides"):
        run_model_chain(spark, models, sources={"orders": orders})


def test_view_chain_is_one_catalyst_plan(spark):
    """The 100 TB point of view-materialization: a mart's filter pushes
    down THROUGH two model boundaries into the parquet scan, and the
    plan contains no mid-DAG barrier."""
    from dlt_spark.helpers import run_model_chain

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = run_model_chain(
        spark,
        {
            "stg": "SELECT o_orderkey, o_orderstatus, o_totalprice FROM {{ source('orders') }}",
            "mid": "SELECT * FROM {{ ref('stg') }}",
            "mart": "SELECT o_orderkey, o_totalprice FROM {{ ref('mid') }} WHERE o_orderstatus = 'F'",
        },
        sources={"orders": orders},
    )
    plan = out["mart"]._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "o_orderstatus" in pushed, plan
    # column pruning reached the scan too: only the 3 referenced columns
    assert "o_orderdate" not in plan.split("ReadSchema")[1][:300]


def test_materialize_barrier_and_unknown_name(spark):
    from dlt_spark.helpers import ModelChainError, run_model_chain

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    models = {
        "stg": "SELECT o_orderkey FROM {{ source('orders') }} WHERE o_orderkey % 2 = 0",
        "mart": "SELECT count(*) AS n FROM {{ ref('stg') }}",
    }
    out = run_model_chain(
        spark, models, sources={"orders": orders}, materialize={"stg"}
    )
    # the checkpointed model is cut out of the consumer's lineage
    plan = out["mart"]._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "FileScan" not in plan
    n_even = orders.filter("o_orderkey % 2 = 0").count()
    assert out["mart"].collect()[0]["n"] == n_even
    with pytest.raises(ModelChainError, match="materialize"):
        run_model_chain(spark, models, sources={"orders": orders},
                        materialize={"typo"})


def test_quote_styles_and_whitespace(spark):
    from dlt_spark.helpers.models import _deps

    sql = 'SELECT * FROM {{ref("a")}} JOIN {{  source( \'t\' )  }} USING (k)'
    assert _deps(sql) == [("ref", "a"), ("source", "t")]
