"""Spark 4 VariantType for the dlt `json` type (SURVEY §4's flagged
engine extension; reference json type: dlt/common/schema/typing.py).
Opt-in via pipeline(json_as_variant=True): declared json columns store
as binary variant with typed variant_get access.  Default stays
serialized text — variant parquet is not engine-portable (DuckDB
cannot read the shredded encoding), and the reference itself stores
json serialized."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import dlt_spark  # noqa: E402
from dlt_spark.pipeline.resources import DltResource  # noqa: E402
from dlt_spark.schema.spark_types import (  # noqa: E402
    from_spark_type,
    to_spark_type,
    variant_supported,
)


def test_type_mapping_both_ways():
    assert isinstance(to_spark_type({"data_type": "json"}), T.StringType)
    if variant_supported():
        assert isinstance(
            to_spark_type({"data_type": "json"}, json_as_variant=True),
            T.VariantType,
        )
        assert from_spark_type(T.VariantType())["data_type"] == "json"
    else:
        assert isinstance(
            to_spark_type({"data_type": "json"}, json_as_variant=True),
            T.StringType,
        )


ROWS = [
    {"id": 1, "payload": '{"k": 5, "tags": ["a", "b"]}'},
    {"id": 2, "payload": '{"k": 7}'},
    {"id": 3, "payload": None},
]


def _run(spark, tmp_path, variant: bool):
    res = DltResource(list(ROWS), name="vt")
    res.apply_hints(columns={"payload": {"name": "payload", "data_type": "json"}})
    pipe = dlt_spark.pipeline(
        f"vtp_{variant}", str(tmp_path / f"d{variant}"), "ds", spark,
        json_as_variant=variant,
    )
    pipe.run(res)
    return pipe.dataset()["vt"].spark_df()


@pytest.mark.skipif(not variant_supported(), reason="no VariantType in runtime")
def test_variant_roundtrip_typed_access(spark, tmp_path):
    out = _run(spark, tmp_path, variant=True)
    assert isinstance(out.schema["payload"].dataType, T.VariantType)
    got = {
        r["id"]: r["k"]
        for r in out.selectExpr(
            "id", "variant_get(payload, '$.k', 'bigint') AS k"
        ).collect()
    }
    assert got == {1: 5, 2: 7, 3: None}


def test_text_roundtrip_default(spark, tmp_path):
    out = _run(spark, tmp_path, variant=False)
    assert isinstance(out.schema["payload"].dataType, T.StringType)
    got = {
        r["id"]: r["k"]
        for r in out.select(
            "id", F.get_json_object("payload", "$.k").cast("bigint").alias("k")
        ).collect()
    }
    assert got == {1: 5, 2: 7, 3: None}


@pytest.mark.skipif(not variant_supported(), reason="no VariantType in runtime")
def test_variant_append_and_relation_read(spark, tmp_path):
    """Second batch appends through the same variant column and the
    Relation read path (where/select) works over the variant table."""
    res = DltResource(list(ROWS), name="vt")
    res.apply_hints(columns={"payload": {"name": "payload", "data_type": "json"}})
    pipe = dlt_spark.pipeline(
        "vtp_app", str(tmp_path / "da"), "ds", spark, json_as_variant=True
    )
    pipe.run(res)
    res2 = DltResource([{"id": 4, "payload": '{"k": 9}'}], name="vt")
    res2.apply_hints(columns={"payload": {"name": "payload", "data_type": "json"}})
    pipe.run(res2)
    rel = pipe.dataset()["vt"]
    assert len(rel.fetchall()) == 4
    df = rel.spark_df().selectExpr(
        "id", "variant_get(payload, '$.k', 'bigint') AS k"
    ).where("k > 5")
    assert {r["id"] for r in df.collect()} == {2, 4}
