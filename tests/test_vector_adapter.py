"""vector_adapter tests (reference lancedb_adapter: x-embed hints on a
resource, embeddings materialized on load)."""

import math

import pytest
from pyspark.sql import functions as F

import dlt_spark
from dlt_spark.dataops.vector import hash_embedding, vector_adapter


def test_hash_embedding_deterministic(spark):
    df = spark.createDataFrame(
        [("hello world",), ("hello world",), ("goodbye moon",)], "text string"
    )
    rows = df.select(hash_embedding(F.col("text"), dims=8).alias("e")).collect()
    assert rows[0]["e"] == rows[1]["e"]  # same text -> same vector
    assert rows[0]["e"] != rows[2]["e"]
    assert len(rows[0]["e"]) == 8
    assert all(isinstance(x, float) for x in rows[0]["e"])


def test_adapter_sets_hint_and_load_materializes(spark, tmp_path):
    data = [
        {"id": 1, "title": "moonbase engineer"},
        {"id": 2, "title": "submarine chef"},
    ]
    res = vector_adapter(
        dlt_spark.resource(data, name="people"), embed="title", dims=4
    )
    assert res.columns["title"]["x_embed"] is True

    pipe = dlt_spark.pipeline(
        "vec_pipe", destination=str(tmp_path / "d"), dataset_name="ds", spark=spark
    )
    pipe.run(res, table_name="people")
    out = pipe.dataset()["people"].spark_df()
    assert "title__embedding" in out.columns
    emb = {r["id"]: r["title__embedding"] for r in out.collect()}
    assert len(emb[1]) == 4 and emb[1] != emb[2]
    # embedding column is registered in the schema
    cols = pipe.schema.tables["people"]["columns"]
    assert "title__embedding" in cols


def test_adapter_embeddings_feed_similarity(spark, tmp_path):
    from dlt_spark.dataops.similarity import cosine_topk

    data = [
        {"id": 1, "txt": "apple banana cherry"},
        {"id": 2, "txt": "apple banana cherry"},
        {"id": 3, "txt": "xylophone quartz zebra"},
    ]
    res = vector_adapter(dlt_spark.resource(data, name="docs"), embed="txt", dims=8)
    pipe = dlt_spark.pipeline(
        "vec_pipe2", destination=str(tmp_path / "d"), dataset_name="ds", spark=spark
    )
    pipe.run(res, table_name="docs")
    docs = pipe.dataset()["docs"].spark_df().select(
        "id", F.col("txt__embedding").alias("embedding")
    )
    q = docs.filter(F.col("id") == 1).select(F.col("embedding").alias("q")).collect()[0]["q"]
    top = cosine_topk(docs, q, id_col="id", vec_col="embedding", k=2)
    ids = [r["id"] for r in top.collect()]
    assert ids[0] in (1, 2) and set(ids) == {1, 2}  # identical text ranks first


def test_adapter_raw_data_and_validation():
    with pytest.raises(ValueError):
        vector_adapter([{"a": 1}], embed=[])
    res = vector_adapter([{"name": "x", "bio": "y"}], embed=["bio"])
    assert res.columns["bio"]["x_embed"] is True
