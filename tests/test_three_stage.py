"""Three-stage API parity (reference pipeline.extract/normalize/load) +
path filters + scheduler-window incremental + schema dot export."""

import pytest

import dlt_spark
from dlt_spark.incremental import from_scheduler_window
from dlt_spark.normalize.relational import RelationalNormalizer
from dlt_spark.pipeline.resources import _dicts_to_df


def test_extract_normalize_load_staged(spark, tmp_path):
    pipe = dlt_spark.pipeline("st", str(tmp_path / "d"), "ds", spark)
    ei = pipe.extract([{"id": 1, "items": [{"v": 1}]}], table_name="a")
    assert ei.resource_names == ["a"]
    ni = pipe.normalize(ei)
    assert "a" in ni.table_names and "a__items" in ni.table_names
    li = pipe.load(ni)
    assert pipe.dataset()["a"].row_count() == 1
    assert pipe.dataset()["a__items"].row_count() == 1
    assert li.load_id in pipe.dataset().load_ids()


def test_staged_defaults_to_pending(spark, tmp_path):
    pipe = dlt_spark.pipeline("st2", str(tmp_path / "d"), "ds", spark)
    pipe.extract([{"id": 2}], table_name="b")
    pipe.normalize()
    pipe.load()
    assert pipe.dataset()["b"].row_count() == 1
    with pytest.raises(ValueError):
        pipe.load()  # nothing pending anymore


def test_normalizer_path_filters(spark):
    df = _dicts_to_df(spark, [{"id": 1, "keep_me": "y", "secret_token": "x", "meta": {"secret_key": "z", "ok": 1}}])
    norm = RelationalNormalizer(exclude_paths=[r"secret"])
    out = norm.normalize(df, "t", row_id_type="key_hash", primary_key=["id"])
    cols = out["t"].columns
    assert "secret_token" not in cols
    assert not any("secret" in c for c in cols)
    assert "meta__ok" in cols and "keep_me" in cols

    norm_inc = RelationalNormalizer(include_paths=[r"^id$", r"^keep"])
    out2 = norm_inc.normalize(df, "t", row_id_type="key_hash", primary_key=["id"])
    assert set(c for c in out2["t"].columns if not c.startswith("_dlt_")) == {"id", "keep_me"}


def test_scheduler_window(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    inc = from_scheduler_window("l_shipdate", "1996-01-01", "1996-02-01")
    got = inc.apply(li)
    from pyspark.sql import functions as F

    bounds = got.agg(F.min("l_shipdate"), F.max("l_shipdate")).collect()[0]
    assert str(bounds[0]) >= "1996-01-01"
    assert str(bounds[1]) < "1996-02-01"


def test_schema_to_dot():
    from dlt_spark.schema.schema import Schema
    from dlt_spark.schema.typing import new_column, new_table

    s = Schema("d")
    s.update_table(new_table("p", columns=[new_column("id", "bigint")]))
    s.update_table(new_table("p__c", parent="p", columns=[new_column("v", "text")]))
    dot = s.to_dot()
    assert "digraph" in dot and '"p" -> "p__c"' in dot


def test_relation_write_exports(spark, tmp_path):
    import dlt_spark

    pipe = dlt_spark.pipeline("w", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": 1}, {"id": 2}], table_name="t")
    rel = pipe.dataset()["t"].select("id")
    rel.write_parquet(str(tmp_path / "out_pq"))
    rel.write_jsonl(str(tmp_path / "out_jl"))
    rel.write_csv(str(tmp_path / "out_csv"))
    assert spark.read.parquet(str(tmp_path / "out_pq")).count() == 2
    assert spark.read.json(str(tmp_path / "out_jl")).count() == 2
    assert spark.read.option("header", "true").csv(str(tmp_path / "out_csv")).count() == 2
