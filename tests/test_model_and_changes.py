"""SQL-model resources + write-disposition changes across runs
(reference test_write_disposition_changes.py)."""

import pytest

import dlt_spark


def test_model_resource(spark, tmp_path):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").createOrReplaceTempView(
        "src_t"
    )
    pipe = dlt_spark.pipeline("mdl", str(tmp_path / "d"), "ds", spark)
    pipe.run(dlt_spark.model("SELECT id, upper(v) AS v FROM src_t", name="derived"))
    ds = pipe.dataset()
    rows = {r["id"]: r["v"] for r in ds["derived"].spark_df().collect()}
    assert rows == {1: "A", 2: "B"}
    # dlt columns injected like any resource
    assert "_dlt_id" in ds["derived"].columns and "_dlt_load_id" in ds["derived"].columns


def test_disposition_change_append_then_merge(spark, tmp_path):
    pipe = dlt_spark.pipeline("wdc", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], table_name="t")
    # switch to merge: overlapping key replaces, new key inserts
    pipe.run(
        [{"id": 2, "v": "b2"}, {"id": 3, "v": "c"}],
        table_name="t",
        write_disposition="merge",
        primary_key="id",
    )
    rows = {r["id"]: r["v"] for r in pipe.dataset()["t"].spark_df().collect()}
    assert rows == {1: "a", 2: "b2", 3: "c"}


def test_disposition_change_merge_then_replace(spark, tmp_path):
    pipe = dlt_spark.pipeline("wdc2", str(tmp_path / "d"), "ds", spark)
    pipe.run(
        [{"id": 1, "v": "a"}],
        table_name="t",
        write_disposition="merge",
        primary_key="id",
    )
    pipe.run([{"id": 9, "v": "z"}], table_name="t", write_disposition="replace")
    rows = pipe.dataset()["t"].spark_df().collect()
    assert len(rows) == 1 and rows[0]["id"] == 9
