"""Unit tests for the data-quality expectations module."""

from pyspark.sql import functions as F


def _report(df, checks):
    from dlt_spark.dataops.expectations import run_checks

    return {
        (r["check"], r["target"]): (r["metric"], r["passed"])
        for r in run_checks(df, checks).collect()
    }


def test_row_local_checks_one_scan(spark):
    from dlt_spark.dataops.expectations import (
        accepted_values,
        in_range,
        matches_regex,
        not_null,
    )

    df = spark.createDataFrame(
        [
            (1, "A", 10.0, "a@x.com"),
            (2, "B", -5.0, "bad"),
            (None, "A", 200.0, None),
            (4, "Z", None, "c@y.org"),
        ],
        ["id", "flag", "amount", "email"],
    )
    rep = _report(
        df,
        [
            not_null("id", "amount"),
            accepted_values("flag", ["A", "B"]),
            in_range("amount", 0, 100),
            matches_regex("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        ],
    )
    assert rep[("not_null", "id")] == (1, False)
    assert rep[("not_null", "amount")] == (1, False)
    assert rep[("accepted_values", "flag")] == (1, False)  # only 'Z'
    # -5 and 200 out of range; NULL amount ignored here
    assert rep[("in_range", "amount")] == (2, False)
    # 'bad' fails the regex; NULL email ignored
    assert rep[("matches_regex", "email")] == (1, False)


def test_unique_counts_extras_only(spark):
    from dlt_spark.dataops.expectations import unique

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    rep = _report(df, [unique("k")])
    # key 1 has 3 rows -> 2 extras
    assert rep[("unique", "k")] == (2, False)
    rep2 = _report(df.dropDuplicates(["k"]), [unique("k")])
    assert rep2[("unique", "k")] == (0, True)


def test_references_null_fk_passes(spark):
    from dlt_spark.dataops.expectations import references

    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (99, "orphan"), (None, "null-fk")],
        ["fk", "v"],
    )
    rep = _report(child, [references(["fk"], parent, ["pk"])])
    # 99 is an orphan; the NULL fk passes per SQL FK semantics
    assert rep[("references", "fk")] == (1, False)


def test_all_passing_report(spark):
    from dlt_spark.dataops.expectations import not_null, unique

    df = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    rep = _report(df, [not_null("id"), unique("id")])
    assert all(passed for _, passed in rep.values())
    assert all(metric == 0 for metric, _ in rep.values())


def test_row_local_folds_into_single_aggregate(spark):
    """All row-local checks must share one scan: the physical plan has
    exactly one FileScan/LocalTableScan-rooted aggregate path and no
    join for the row-local-only case."""
    from dlt_spark.dataops.expectations import (
        accepted_values,
        in_range,
        not_null,
        run_checks,
    )

    df = spark.createDataFrame([(1, "A", 5.0)], ["id", "flag", "amount"])
    plan = run_checks(
        df,
        [not_null("id"), accepted_values("flag", ["A"]), in_range("amount", 0, 9)],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") <= 2  # data scan + no per-check scans
    assert "Join" not in plan


def test_freshness_check(spark):
    import datetime as dt

    from dlt_spark.dataops.expectations import freshness

    now = dt.datetime(2024, 6, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 11, 30)), (2, dt.datetime(2024, 6, 1, 9, 0))],
        ["id", "ts"],
    )
    # newest row is 30 min old: passes a 1h bound, fails a 10min bound
    rep = _report(df, [freshness("ts", 3600, now=now)])
    assert rep[("freshness", "ts")] == (0, True)
    rep = _report(df, [freshness("ts", 600, now=now)])
    assert rep[("freshness", "ts")] == (1, False)
    # empty table is stale by definition
    rep = _report(df.filter(F.col("id") < 0), [freshness("ts", 3600, now=now)])
    assert rep[("freshness", "ts")] == (1, False)


def test_pipeline_check_persists_report(spark, tmp_path):
    import dlt_spark
    from dlt_spark.dataops.expectations import in_range, not_null, unique
    from dlt_spark.pipeline.pipeline import DataQualityError

    pipe = dlt_spark.pipeline(
        "dq_pipe", destination=str(tmp_path / "dest"), dataset_name="ds",
        spark=spark,
    )
    pipe.run(
        [{"id": 1, "v": 5.0}, {"id": 2, "v": 50.0}, {"id": 2, "v": 7.0}],
        table_name="t",
    )
    report = pipe.check(
        "t", [not_null("id"), in_range("v", 0, 10), unique("id")]
    )
    got = {(r["check"], r["target"]): r["metric"] for r in report.collect()}
    assert got[("not_null", "id")] == 0
    assert got[("in_range", "v")] == 1  # 50.0 out of range
    assert got[("unique", "id")] == 1  # duplicate id=2
    # report persisted to the _dlt_dq_reports system table with stamps
    stored = pipe.store.read("_dlt_dq_reports").collect()
    assert len(stored) == 3
    assert all(r["table_name"] == "t" for r in stored)
    assert all(r["load_id"] is not None for r in stored)
    # raise_on_failure surfaces the failing checks
    import pytest as _pytest

    with _pytest.raises(DataQualityError, match="in_range"):
        pipe.check("t", [in_range("v", 0, 10)], store_report=False,
                   raise_on_failure=True)
    # history accumulated only from the store_report=True call
    assert pipe.store.read("_dlt_dq_reports").count() == 3


def test_unique_approx_folds_into_scan(spark):
    from dlt_spark.dataops.expectations import not_null, run_checks, unique

    df = spark.createDataFrame(
        [(i % 50, "x") for i in range(200)], ["k", "v"]
    )
    rep = run_checks(df, [not_null("k"), unique("k", approx=True)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # the approx form must not introduce a join or an exchange beyond
    # the single aggregation pair
    assert "Join" not in plan
    got = {
        (r["check"], r["target"]): r for r in rep.collect()
    }
    m = got[("unique_approx", "k")]["metric"]
    # 150 true extras; HLL ~2% error on 50 distinct is exact-ish here
    assert abs(m - 150) <= 5
    assert got[("unique_approx", "k")]["passed"] is False
