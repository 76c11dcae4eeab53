"""dlt.attach analog: reconstruct a pipeline from destination state
(reference dlt/pipeline/__init__.py:185 attach + CannotRestore...)."""

import pytest

import dlt_spark


def test_attach_restores_schema_and_state(spark, tmp_path):
    dest = str(tmp_path / "dest")
    pipe = dlt_spark.pipeline("att_pipe", destination=dest, dataset_name="ds", spark=spark)
    inc = dlt_spark.incremental("updated_at", primary_key=["id"])
    pipe.run(
        [
            {"id": 1, "updated_at": "2024-01-01T00:00:00", "v": "a"},
            {"id": 2, "updated_at": "2024-01-02T00:00:00", "v": "b"},
        ],
        table_name="users",
        write_disposition="merge",
        primary_key="id",
        incremental=inc,
    )

    att = dlt_spark.attach("att_pipe", dest, "ds", spark)
    # schema restored without re-declaring anything
    assert "users" in att.schema.tables
    assert att.schema.version_hash == pipe.schema.version_hash
    # state (incremental cursor) restored
    rstate = att.state.resource_state("ds", "users")
    assert rstate["incremental"]["last_value"].startswith("2024-01-02")

    # resume: re-run with one old and one new row — only the new lands
    inc2 = dlt_spark.incremental("updated_at", primary_key=["id"])
    att.run(
        [
            {"id": 2, "updated_at": "2024-01-02T00:00:00", "v": "b"},  # seen
            {"id": 3, "updated_at": "2024-01-03T00:00:00", "v": "c"},  # new
        ],
        table_name="users",
        write_disposition="merge",
        primary_key="id",
        incremental=inc2,
    )
    rows = {r["id"]: r["v"] for r in att.dataset()["users"].spark_df().collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_attach_missing_raises(spark, tmp_path):
    with pytest.raises(dlt_spark.CannotAttachPipeline):
        dlt_spark.attach("nope", str(tmp_path / "empty"), "ds", spark)


def test_standalone_dataset_access(spark, tmp_path):
    """dlt.dataset(destination, name) opens a dataset without a pipeline
    and restores the committed schema."""
    dest = str(tmp_path / "dest_ds")
    pipe = dlt_spark.pipeline("dsp", destination=dest, dataset_name="ds", spark=spark)
    pipe.run([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], table_name="items")

    ds = dlt_spark.dataset(dest, "ds", spark=spark)
    assert ds["items"].row_count() == 2
    assert ds.schema is not None and "items" in ds.schema.tables
    assert ds.latest_load_id is not None
