"""Pluggable naming conventions beyond snake_case (reference
naming/duck_case, sql_cs_v1, sql_ci_v1, direct)."""

import time

import pytest

from dlt_spark.schema.naming import (
    DirectNaming,
    DuckCaseNaming,
    SqlCiNaming,
    SqlCsNaming,
    naming_from_name,
)


def test_duck_case_keeps_case_and_unicode():
    n = DuckCaseNaming()
    assert n.normalize_identifier("Camel Case") == "Camel_Case"
    assert n.normalize_identifier("with🦆duck") == "with🦆duck"
    assert n.normalize_identifier("a/b\\c.d") == "a_b_c_d"


def test_sql_cs_preserves_case():
    n = SqlCsNaming()
    assert n.normalize_identifier("MyColumn!") == "MyColumn_"
    assert n.normalize_identifier("1abc") == "_1abc"


def test_sql_ci_lowercases():
    n = SqlCiNaming()
    assert n.normalize_identifier("MyColumn") == "mycolumn"
    assert not n.is_case_sensitive


def test_direct_passthrough():
    n = DirectNaming()
    assert n.normalize_identifier("Keep-As.Is") == "Keep-As.Is"


def test_registry():
    assert isinstance(naming_from_name("duck_case"), DuckCaseNaming)
    with pytest.raises(ValueError):
        naming_from_name("nope")


def test_max_time_limit(spark):
    from dlt_spark.pipeline.resources import DltResource

    def slow_gen():
        for i in range(1000):
            time.sleep(0.01)
            yield {"v": i}

    res = DltResource(slow_gen, name="slow").add_limit(max_time=0.3)
    out = res.materialize(spark)["slow"]
    assert 1 <= out.count() < 1000


def test_with_load_id_col(spark, tmp_path):
    import dlt_spark

    pipe = dlt_spark.pipeline("lid", str(tmp_path / "d"), "ds", spark)
    pipe.run(
        [{"id": 1, "items": [{"v": 1}, {"v": 2}]}],
        table_name="a",
        write_disposition="merge",
        primary_key="id",
    )
    ds = pipe.dataset()
    load_id = ds.load_ids()[0]
    # root table: direct column
    assert ds["a"].with_load_id_col().spark_df().collect()[0]["_dlt_load_id"] == load_id
    # nested table: recovered via root join
    child = ds["a__items"].with_load_id_col().spark_df().collect()
    assert all(r["_dlt_load_id"] == load_id for r in child)
