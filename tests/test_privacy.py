"""k-anonymity audit + suppression (dataops/privacy.py) — the
structural-identifiability companion to text-level pii_redaction."""

import pytest
from pyspark.sql import functions as F

from dlt_spark.dataops.privacy import (
    k_anonymity_report,
    k_anonymity_stats,
    suppress_small_groups,
)


@pytest.fixture()
def people(spark):
    # (zip, age) quasi-identifiers: group sizes 3, 2, 1
    rows = [
        ("94110", 30, "a"), ("94110", 30, "b"), ("94110", 30, "c"),
        ("94110", 31, "d"), ("94110", 31, "e"),
        ("10001", 40, "f"),
    ]
    return spark.createDataFrame(rows, "zip string, age int, name string")


def test_report_lists_violating_groups_smallest_first(people):
    out = k_anonymity_report(people, ["zip", "age"], k=3).collect()
    assert [(r["zip"], r["age"], r["group_size"]) for r in out] == [
        ("10001", 40, 1),
        ("94110", 31, 2),
    ]


def test_report_empty_when_k_anonymous(people):
    assert k_anonymity_report(people, ["zip", "age"], k=1).count() == 0


def test_nulls_form_their_own_group(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("x", 3)], "qi string, v int"
    )
    out = k_anonymity_report(df, ["qi"], k=3).collect()
    assert {(r["qi"], r["group_size"]) for r in out} == {(None, 2), ("x", 1)}


def test_stats_summary(people):
    row = k_anonymity_stats(people, ["zip", "age"], k=3).collect()[0]
    assert row["n_groups"] == 3
    assert row["n_violating_groups"] == 2
    assert row["n_rows"] == 6
    assert row["n_suppressed_rows"] == 3
    assert row["min_group_size"] == 1


def test_suppression_leaves_k_anonymous_table(people):
    out = suppress_small_groups(people, ["zip", "age"], k=3)
    assert sorted(r["name"] for r in out.collect()) == ["a", "b", "c"]
    # enforced: the suppressed table audits clean at the same k
    assert k_anonymity_report(out, ["zip", "age"], k=3).count() == 0


def test_l_diversity_flags_homogeneous_groups(spark):
    from dlt_spark.dataops.privacy import l_diversity_report

    df = spark.createDataFrame(
        [
            ("94110", "flu"), ("94110", "flu"), ("94110", "flu"),  # homogeneous
            ("10001", "flu"), ("10001", "cold"),                   # diverse
        ],
        "zip string, diagnosis string",
    )
    out = l_diversity_report(df, ["zip"], "diagnosis", l=2).collect()
    assert [(r["zip"], r["group_size"], r["distinct_sensitive"]) for r in out] == [
        ("94110", 3, 1)
    ]
    assert l_diversity_report(df, ["zip"], "diagnosis", l=1).count() == 0


def test_validation_errors(people):
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(people, ["zip"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity_report(people, [], k=3)


def test_suppression_plan_is_one_agg_plus_antijoin(people):
    plan = suppress_small_groups(people, ["zip", "age"], k=3)._jdf.queryExecution().toString()
    assert "LeftAnti" in plan
