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
