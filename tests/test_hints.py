"""Default hints + preferred types by column-name regex (reference
Schema._infer_hint / preferred_types)."""

import pytest

import dlt_spark


def test_default_hints_applied(spark, tmp_path):
    pipe = dlt_spark.pipeline("h", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": 1, "items": [1, 2]}], table_name="t")
    cols = pipe.schema.tables["t"]["columns"]
    assert cols["_dlt_id"].get("row_key") is True
    child_cols = pipe.schema.tables["t__items"]["columns"]
    assert child_cols["_dlt_parent_id"].get("parent_key") is True


def test_custom_default_hint(spark, tmp_path):
    pipe = dlt_spark.pipeline("h2", str(tmp_path / "d"), "ds", spark)
    pipe.schema.settings["default_hints"]["sort"] = [r"timestamp$"]
    pipe.run([{"id": 1, "event_timestamp": "x"}], table_name="t")
    assert pipe.schema.tables["t"]["columns"]["event_timestamp"].get("sort") is True


def test_preferred_types_cast(spark, tmp_path):
    pipe = dlt_spark.pipeline("h3", str(tmp_path / "d"), "ds", spark)
    pipe.schema.settings["preferred_types"] = {r"_count$": "bigint", r"^price": "decimal"}
    pipe.run([{"id": 1, "click_count": 3.0, "price_usd": 9.5}], table_name="t")
    df = pipe.dataset()["t"].spark_df()
    types = dict(df.dtypes)
    assert types["click_count"] == "bigint"
    assert types["price_usd"].startswith("decimal")
