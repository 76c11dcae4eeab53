"""Schema YAML round-trip + pipeline import/export hooks (reference
schema.py:815 to_pretty_yaml, pipeline import_schema_path workflow)."""

import os

import pytest

import dlt_spark
from dlt_spark.schema.schema import Schema
from dlt_spark.schema.typing import new_column, new_table


def _schema_with_table() -> Schema:
    s = Schema("ds")
    s.update_table(
        new_table(
            "users",
            write_disposition="merge",
            columns=[
                new_column("id", data_type="bigint", primary_key=True),
                new_column("name", data_type="text"),
                new_column("joined", data_type="timestamp"),
            ],
        )
    )
    s.bump_version()
    return s


def test_yaml_roundtrip_preserves_everything():
    s = _schema_with_table()
    text = s.to_pretty_yaml()
    assert "users" in text and "write_disposition" in text
    s2 = Schema.from_yaml(text)
    assert s2.name == s.name
    assert s2.tables == s.tables
    assert s2.version == s.version
    assert s2.version_hash == s.version_hash
    assert s2.previous_hashes == s.previous_hashes
    # a second round-trip is byte-identical (stable for git diffs)
    assert s2.to_pretty_yaml() == text


def test_pipeline_export_then_import(spark, tmp_path):
    schemas = tmp_path / "schemas"
    pipe = dlt_spark.pipeline(
        "yaml_pipe", destination=str(tmp_path / "d"), dataset_name="ds",
        spark=spark, export_schema_path=str(schemas),
    )
    pipe.run([{"id": 1, "name": "a"}], table_name="users")
    exported = schemas / "ds.schema.yaml"
    assert exported.is_file()
    text = exported.read_text()
    assert "users" in text

    # a new pipeline seeded from the exported schema knows the table
    # without having seen any data
    pipe2 = dlt_spark.pipeline(
        "yaml_pipe2", destination=str(tmp_path / "d2"), dataset_name="ds",
        spark=spark, import_schema_path=str(schemas),
    )
    assert "users" in pipe2.schema.tables
    assert pipe2.schema.version_hash == pipe.schema.version_hash
