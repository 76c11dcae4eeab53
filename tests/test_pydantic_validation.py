"""Pydantic model validation — ported shape of the reference
``tests/libs/test_pydantic.py`` basics + ``validation.py`` contract
interplay (columns=Model, freeze/discard_row/discard_value/evolve)."""

import datetime as dt
from decimal import Decimal
from typing import Any, Optional

import pytest

pydantic = pytest.importorskip("pydantic")
from pydantic import BaseModel, ConfigDict, Field, field_validator

from dlt_spark.pipeline.resources import DltResource
from dlt_spark.schema.pydantic import (
    extra_to_column_mode,
    model_validation_step,
    pydantic_to_columns,
    pydantic_to_spark_schema,
)


class Document(BaseModel):
    doc_id: int
    title: str
    score: Optional[float] = None
    created_at: Optional[dt.datetime] = None
    price: Optional[Decimal] = None
    tags: Optional[list] = None
    anything: Any = None


def test_pydantic_to_columns_types():
    cols = pydantic_to_columns(Document)
    assert cols["doc_id"] == {"name": "doc_id", "data_type": "bigint", "nullable": False}
    assert cols["title"]["data_type"] == "text" and not cols["title"]["nullable"]
    assert cols["score"] == {"name": "score", "data_type": "double", "nullable": True}
    assert cols["created_at"]["data_type"] == "timestamp"
    assert cols["price"]["data_type"] == "decimal"
    assert cols["tags"]["data_type"] == "json"
    assert "anything" not in cols  # Any: inferred from data (reference parity)


def test_pydantic_alias_and_spark_schema():
    class Aliased(BaseModel):
        value: int = Field(alias="renamed")

    cols = pydantic_to_columns(Aliased)
    assert list(cols) == ["renamed"]
    schema = pydantic_to_spark_schema(Document)
    by_name = {f.name: f for f in schema.fields}
    assert by_name["doc_id"].dataType.typeName() == "long"
    assert not by_name["doc_id"].nullable and by_name["score"].nullable


def test_extra_config_to_column_mode():
    assert extra_to_column_mode("allow") == "evolve"
    assert extra_to_column_mode("forbid") == "freeze"
    assert extra_to_column_mode("ignore") == "discard_value"


def make_item_model():
    # defined inside a function so cloudpickle ships the class by value to
    # executors (a module-level class in a test file is pickled by
    # reference and is not importable worker-side; real user code ships
    # via --py-files)
    class Item(BaseModel):
        model_config = ConfigDict(extra="forbid")
        id: int
        name: str

        @field_validator("id")
        @classmethod
        def positive(cls, v):
            if v < 0:
                raise ValueError("id must be >= 0")
            return v

    return Item


Item = make_item_model()


def test_freeze_raises_on_extra_column(spark):
    df = spark.createDataFrame([(1, "a", "x")], "id long, name string, extra string")
    step = model_validation_step(Item)  # extra=forbid -> freeze
    with pytest.raises(ValueError, match="extra columns"):
        step(df).collect()


def test_discard_value_drops_extra_column(spark):
    df = spark.createDataFrame([(1, "a", "x")], "id long, name string, extra string")
    step = model_validation_step(Item, column_mode="discard_value", data_mode="evolve")
    out = step(df)
    assert out.columns == ["id", "name"]


def test_discard_row_filters_invalid(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (-5, "bad"), (2, "ok2"), (None, "null-id")],
        "id long, name string",
    )
    step = model_validation_step(Item, column_mode="evolve", data_mode="discard_row")
    got = {r["name"] for r in step(df).collect()}
    assert got == {"ok", "ok2"}  # validator kills -5; missing id kills null


def test_freeze_raises_on_invalid_row(spark):
    df = spark.createDataFrame([(-5, "bad")], "id long, name string")
    step = model_validation_step(Item, column_mode="evolve", data_mode="freeze")
    with pytest.raises(Exception, match="id must be >= 0"):
        step(df).collect()


def test_columns_model_on_resource(spark):
    res = DltResource(
        data=[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        name="items",
        columns=Item,
    )
    assert res._pydantic_model is Item
    assert res.columns["id"]["data_type"] == "bigint"
    tables = res.materialize(spark)
    df = tables["items"]
    assert df.count() == 2
    # the _dlt_* system columns must survive the column contract
    assert any(c.startswith("_dlt") for c in df.columns) or set(df.columns) >= {"id", "name"}


def test_columns_model_discard_row_via_add_validation(spark):
    class Loose(BaseModel):
        model_config = ConfigDict(extra="allow")
        id: int

        @field_validator("id")
        @classmethod
        def small(cls, v):
            if v > 100:
                raise ValueError("too big")
            return v

    res = DltResource(data=[{"id": 1}, {"id": 500}], name="loose")
    res.add_validation(model=Loose, mode="discard_row")
    df = res.materialize(spark)["loose"]
    assert [r["id"] for r in df.collect()] == [1]


def test_array_columns_validate_as_lists(spark):
    """array<string> cells arrive in pandas batches as numpy arrays;
    List[str] model fields must still validate (regression: pydantic v2
    rejects ndarray)."""
    pydantic = pytest.importorskip("pydantic")
    from typing import List

    from dlt_spark.schema.pydantic import model_validation_step

    class Doc(pydantic.BaseModel):
        id: int
        tags: List[str]

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "id long, tags array<string>"
    )
    out = model_validation_step(Doc, data_mode="discard_row")(df)
    assert out.count() == 2          # every valid row kept, none rejected
