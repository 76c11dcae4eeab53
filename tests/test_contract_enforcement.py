"""Contract enforcement on DATA (F6): discard_value drops columns,
discard_row drops offending rows, tables:discard_* drops whole batches,
freeze raises — through the full pipeline."""

import pytest

import dlt_spark
from dlt_spark.schema.schema import SchemaContractViolation


def _pipe(spark, tmp_path, contract):
    p = dlt_spark.pipeline("ct", str(tmp_path / "d"), "ds", spark)
    p.schema.settings["schema_contract"] = contract
    return p


def test_columns_discard_value(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "discard_value", "data_type": "evolve"})
    pipe.run([{"id": 1, "name": "a"}], table_name="t")
    pipe.run([{"id": 2, "name": "b", "rogue": "x"}], table_name="t")
    df = pipe.dataset()["t"].spark_df()
    assert "rogue" not in df.columns
    assert df.count() == 2  # rows kept, value discarded


def test_columns_discard_row(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "discard_row", "data_type": "evolve"})
    pipe.run([{"id": 1, "name": "a"}], table_name="t")
    pipe.run(
        [{"id": 2, "name": "b", "rogue": "x"}, {"id": 3, "name": "c", "rogue": None}],
        table_name="t",
    )
    rows = {r["id"] for r in pipe.dataset()["t"].spark_df().collect()}
    assert rows == {1, 3}  # id=2 carried a rogue value -> dropped


def test_tables_discard(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "discard_row", "columns": "evolve", "data_type": "evolve"})
    info = pipe.run([{"id": 1}], table_name="unknown_tbl")
    assert info.tables == []
    with pytest.raises(Exception):
        pipe.dataset()["unknown_tbl"].row_count()


def test_columns_freeze_raises(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "freeze", "data_type": "evolve"})
    pipe.run([{"id": 1, "name": "a"}], table_name="t")
    with pytest.raises(SchemaContractViolation):
        pipe.run([{"id": 2, "name": "b", "rogue": "x"}], table_name="t")


def test_data_type_freeze_blocks_variant(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "evolve", "data_type": "freeze"})
    pipe.run([{"id": 1, "price": 10.5}], table_name="t")
    with pytest.raises(SchemaContractViolation):
        pipe.run([{"id": 2, "price": "not-a-number"}], table_name="t")


def test_data_type_discard_row(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "evolve", "data_type": "discard_row"})
    pipe.run([{"id": 1, "price": 10.5}], table_name="t")
    pipe.run([{"id": 2, "price": "oops"}, {"id": 3, "price": 7.5}], table_name="t")
    rows = {r["id"] for r in pipe.dataset()["t"].spark_df().collect()}
    assert rows == {1, 3}


def test_data_type_evolve_registers_variant(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, {"tables": "evolve", "columns": "evolve", "data_type": "evolve"})
    pipe.run([{"id": 1, "price": 10.5}], table_name="t")
    pipe.run([{"id": 2, "price": "oops"}], table_name="t")
    cols = pipe.schema.tables["t"]["columns"]
    variant_cols = [c for c in cols if c.startswith("price__v_")]
    assert variant_cols and cols[variant_cols[0]].get("variant") is True


def test_store_compact(spark, tmp_path):
    import os

    import dlt_spark

    pipe = dlt_spark.pipeline("cp", str(tmp_path / "c"), "ds", spark)
    for i in range(4):
        pipe.run([{"id": i}], table_name="t")
    meta_dir = os.path.join(str(tmp_path / "c"), "ds", "t")
    import json

    with open(os.path.join(meta_dir, "_current")) as f:
        assert len(json.load(f)["paths"]) == 4
    pipe.store.compact("t", target_partitions=1)
    with open(os.path.join(meta_dir, "_current")) as f:
        assert len(json.load(f)["paths"]) == 1
    assert pipe.dataset()["t"].row_count() == 4
