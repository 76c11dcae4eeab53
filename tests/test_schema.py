"""Schema system tests: F1 all-data-types round trip, F6 evolution +
contracts + variants, versioning (models: reference
tests/common/schema/test_coercion.py, test_schema_contract.py,
test_versioning.py)."""

import datetime as dt
from decimal import Decimal

import pytest

import dlt_spark
from dlt_spark.schema.inference import (
    CoercionError,
    coerce_value,
    infer_data_type,
    py_type_to_sc_type,
)
from dlt_spark.schema.schema import Schema, SchemaContractViolation, version_hash
from dlt_spark.schema.typing import new_column, new_table


# ------------------------------------------------- F1: types + coercion

def test_py_type_inference():
    assert py_type_to_sc_type(int) == "bigint"
    assert py_type_to_sc_type(bool) == "bool"  # before int (bool subclasses int)
    assert py_type_to_sc_type(float) == "double"
    assert py_type_to_sc_type(Decimal) == "decimal"
    assert py_type_to_sc_type(dt.datetime) == "timestamp"
    assert py_type_to_sc_type(dt.date) == "date"
    assert py_type_to_sc_type(dt.time) == "time"
    assert py_type_to_sc_type(bytes) == "binary"
    assert py_type_to_sc_type(dict) == "json"


def test_detections():
    assert infer_data_type("2022-05-23T13:26:45.176451Z") == "timestamp"
    assert infer_data_type("2023-02-27") == "date"
    assert infer_data_type(2**64) == "wei"  # large integer
    assert infer_data_type(10**40) == "text"  # beyond wei precision
    assert infer_data_type("hello") == "text"
    assert infer_data_type(1.5) == "double"


def test_coercion_matrix():
    # text -> binary via base64 and 0x hex (reference type_helpers.py:114)
    assert coerce_value("binary", "text", "0xdeadbeef") == bytes.fromhex("deadbeef")
    assert coerce_value("binary", "text", "YmluYXJ5IGRhdGE=") == b"binary data"
    # text -> bigint with hex support (:123)
    assert coerce_value("bigint", "text", "0xff") == 255
    assert coerce_value("bigint", "text", " 42 ") == 42
    # timestamp <-> epoch (:224-226)
    ts = coerce_value("timestamp", "bigint", 1653312405)
    assert ts.year == 2022 and ts.tzinfo is not None
    assert coerce_value("bigint", "timestamp", ts) == 1653312405
    # json -> text serialization (:91)
    assert coerce_value("text", "json", {"a": 1}) == '{"a": 1}'
    # str2bool
    assert coerce_value("bool", "text", "True") is True
    assert coerce_value("bool", "text", "0") is False
    # failures -> CoercionError (variant path)
    with pytest.raises(CoercionError):
        coerce_value("bigint", "text", "not-a-number")
    with pytest.raises(CoercionError):
        coerce_value("bool", "text", "maybe")


def test_all_data_types_roundtrip(spark, tmp_path):
    """F1: every dlt type survives pipeline -> store -> read."""
    row = {
        "col1": 989127831,
        "col2": 898912.821982,
        "col3": True,
        "col4": "2022-05-23T13:26:45.176451Z",
        "col5": "string data \\n \r 🦆",
        "col6": 2323.34,
        "col9": {"json": [1, 2, 3, "a"]},
        "col10": "2023-02-27",
        "col1_null": None,
        "col5_null": None,
    }
    pipe = dlt_spark.pipeline("types", str(tmp_path / "d"), "ds", spark)
    pipe.run([row], table_name="all_types")
    got = pipe.dataset()["all_types"].spark_df().collect()[0].asDict()
    assert got["col1"] == 989127831
    assert abs(got["col2"] - 898912.821982) < 1e-9
    assert got["col3"] is True
    assert got["col5"] == "string data \\n \r 🦆"
    assert got["col10"] == "2023-02-27"  # detection->date left to casts
    assert got["col1_null"] is None


# --------------------------------------- F6: evolution/contracts/variants

def _products_pipe(spark, tmp_path, contract=None):
    return dlt_spark.pipeline("prod", str(tmp_path / "d"), "ds", spark)


def test_schema_evolution_new_column(spark, tmp_path):
    pipe = _products_pipe(spark, tmp_path)
    pipe.run([{"id": 1, "name": "a"}], table_name="products")
    pipe.run([{"id": 2, "name": "b", "price": 9.5}], table_name="products")
    df = pipe.dataset()["products"].spark_df()
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["price"] is None  # old rows null-filled
    assert rows[2]["price"] == 9.5


def test_variant_column_on_type_conflict(spark, tmp_path):
    pipe = _products_pipe(spark, tmp_path)
    pipe.run([{"id": 1, "price": 10.5}], table_name="products")
    pipe.run([{"id": 2, "price": "not-a-number"}], table_name="products")
    df = pipe.dataset()["products"].spark_df()
    cols = set(df.columns)
    variant_cols = [c for c in cols if c.startswith("price__v_")]
    assert variant_cols, cols
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["price"] == 10.5
    assert rows[2]["price"] is None
    assert rows[2][variant_cols[0]] == "not-a-number"


def test_contract_freeze_tables():
    s = Schema("test", contract={"tables": "freeze", "columns": "evolve", "data_type": "evolve"})
    # declared schema bypasses the contract; data-driven updates don't
    s.update_table(new_table("known", columns=[new_column("id", "bigint")]), apply_contract=False)
    with pytest.raises(SchemaContractViolation):
        s.update_table(new_table("unknown_table", columns=[new_column("x", "text")]))


def test_contract_freeze_columns():
    s = Schema("test", contract={"tables": "evolve", "columns": "freeze", "data_type": "evolve"})
    s.update_table(new_table("t", columns=[new_column("id", "bigint")]), apply_contract=False)
    with pytest.raises(SchemaContractViolation):
        s.update_table(new_table("t", columns=[new_column("new_col", "text")]))


def test_contract_discard_column():
    s = Schema("test", contract={"tables": "evolve", "columns": "discard_value", "data_type": "evolve"})
    s.update_table(new_table("t", columns=[new_column("id", "bigint")]), apply_contract=False)
    s.update_table(new_table("t", columns=[new_column("extra", "text")]))
    assert "extra" not in s.tables["t"]["columns"]


def test_version_hash_chain():
    s = Schema("v")
    h0 = s.version_hash
    s.update_table(new_table("t", columns=[new_column("a", "bigint")]))
    assert s.bump_version()
    assert s.version == 2 and s.version_hash != h0
    assert s.previous_hashes == [h0]
    assert not s.bump_version()  # no change -> no bump
    # deterministic: same content == same hash
    s2 = Schema("v")
    s2.update_table(new_table("t", columns=[new_column("a", "bigint")]))
    s2.bump_version()
    assert s2.version_hash == s.version_hash


def test_schema_serialization_roundtrip():
    s = Schema("rt")
    s.update_table(new_table("t", write_disposition="merge", columns=[new_column("a", "bigint", primary_key=True)]))
    s.bump_version()
    s2 = Schema.from_json(s.to_json())
    assert s2.version_hash == s.version_hash
    assert s2.tables["t"]["columns"]["a"]["primary_key"] is True


def test_schema_export():
    s = Schema("exp")
    s.update_table(new_table("parent", columns=[new_column("id", "bigint")]))
    s.update_table(new_table("parent__items", parent="parent", columns=[new_column("v", "text")]))
    mm = s.to_mermaid()
    assert "erDiagram" in mm and "parent__items" in mm
    dbml = s.to_dbml()
    assert "Table parent" in dbml and "Ref:" in dbml
