"""Stored-schema engine-version migration (reference
``dlt/common/schema/migrations.py:41 migrate_schema``): attaching to a
dataset written by an older engine build upgrades the stored dict
through the ladder and round-trips in this engine's native format."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlt_spark.schema.migrations import (  # noqa: E402
    REFERENCE_ENGINE,
    SchemaEngineNoUpgradePath,
    looks_like_reference_schema,
    migrate_schema,
    upgrade_reference_schema,
)
from dlt_spark.schema.schema import Schema  # noqa: E402
from dlt_spark.schema.typing import LOADS_TABLE_NAME, VERSION_TABLE_NAME  # noqa: E402


def engine2_schema() -> dict:
    """A hand-authored engine-2 stored schema in the reference's old
    format: flat ``tables`` (name -> columns), top-level ``hints`` /
    ``preferred_types`` / ``excludes``, sealed flag — every shape the
    ladder has to repackage."""
    return {
        "name": "event",
        "engine_version": 2,
        "version": 4,
        "tables": {
            "event_user": {
                "timestamp": {
                    "name": "timestamp", "data_type": "timestamp",
                    "nullable": False,
                },
                "payload": {
                    "name": "payload", "data_type": "complex",
                    "nullable": True,
                },
                "_dlt_id": {
                    "name": "_dlt_id", "data_type": "text",
                    "nullable": False, "unique": True,
                },
            },
            "event_user__parse_data__entities": {
                "value": {"name": "value", "data_type": "text",
                          "nullable": True},
                "_dlt_id": {"name": "_dlt_id", "data_type": "text",
                            "nullable": False},
                "_dlt_parent_id": {
                    "name": "_dlt_parent_id", "data_type": "text",
                    "nullable": False, "foreign_key": True,
                },
                # legacy null-first incomplete column: must be dropped
                "ghost": {"name": "ghost", "nullable": True,
                          "x-normalizer": {"seen-null-first": True}},
            },
        },
        "hints": {"not_null": ["^_dlt_id$", "^timestamp$"]},
        "preferred_types": {"^timestamp$": "timestamp", "^payload$": "complex"},
        "excludes": ["^event_user__parse_data__ignored"],
        "includes": [],
        "schema_sealed": True,
    }


def engine11_schema() -> dict:
    """A current reference-format (engine 11) stored schema."""
    return {
        "name": "jaffle",
        "engine_version": 11,
        "version": 7,
        "version_hash": "abcd1234",
        "previous_hashes": ["00ff"],
        "normalizers": {
            "names": "dlt.common.normalizers.names.snake_case",
            "json": {"module": "relational",
                     "config": {"max_nesting": 3}},
            "use_break_path_on_normalize": False,
        },
        "settings": {
            "default_hints": {
                "not_null": ["re:^_dlt_id$"],
                "row_key": ["_dlt_id"],
                "parent_key": ["_dlt_parent_id"],
            },
            "preferred_types": {"re:timestamp$": "timestamp"},
            "schema_contract": "freeze",
        },
        "tables": {
            "orders": {
                "name": "orders",
                "columns": {
                    "id": {"name": "id", "data_type": "bigint",
                           "nullable": False, "row_key": True},
                    "meta": {"name": "meta", "data_type": "json",
                             "nullable": True},
                },
                "x-normalizer": {"seen-data": True},
            },
        },
    }


def test_ladder_engine2_to_11():
    d = migrate_schema(engine2_schema(), 2, REFERENCE_ENGINE)
    assert d["engine_version"] == REFERENCE_ENGINE
    # repackage: tables became table schemas with detected parents
    child = d["tables"]["event_user__parse_data__entities"]
    assert child["name"] == "event_user__parse_data__entities"
    assert child["parent"] == "event_user"
    assert "parent" not in d["tables"]["event_user"]
    # filters moved to a (new) root table as re: paths
    root = d["tables"]["event_user"]
    assert root["filters"]["excludes"] == ["re:^parse_data__ignored"]
    # engine 5/6: engine tables installed
    assert VERSION_TABLE_NAME in d["tables"]
    assert d["tables"][LOADS_TABLE_NAME]["columns"]["load_id"]["nullable"] is False
    # engine 7: sealed flags gone
    assert "schema_sealed" not in d["settings"]
    # engine 8: hash chain exists
    assert d["previous_hashes"] == []
    # engine 9: seen-data on tables that carried _dlt_id
    assert root["x-normalizer"]["seen-data"] is True
    # engine 10: complex -> json, key hints replace foreign_key
    assert root["columns"]["payload"]["data_type"] == "json"
    assert root["columns"]["_dlt_id"]["row_key"] is True
    assert child["columns"]["_dlt_parent_id"]["parent_key"] is True
    assert "foreign_key" not in child["columns"]["_dlt_parent_id"]
    assert d["settings"]["preferred_types"]["re:^payload$"] == "json"
    assert d["settings"]["default_hints"]["row_key"] == ["_dlt_id"]
    # engine 11: path-breaking pinned off
    assert d["normalizers"]["use_break_path_on_normalize"] is False
    # legacy incomplete seen-null-first column dropped
    assert "ghost" not in child["columns"]


def test_attach_engine2_roundtrips_native():
    src = engine2_schema()
    s = Schema.from_dict(src)
    assert isinstance(s, Schema)
    assert s.name == "event"
    assert s.tables["event_user__parse_data__entities"]["parent"] == "event_user"
    # hints were unwrapped to plain regexes our engines consume
    assert "^_dlt_id$" in s.settings["default_hints"]["row_key"] or \
        s.settings["default_hints"]["row_key"] == ["^_dlt_id$"]
    assert s.infer_hints("_dlt_id").get("row_key") is True
    assert s.preferred_type("payload") == "json"
    # round-trip through the NATIVE format is stable (no re-migration)
    j = s.to_json()
    s2 = Schema.from_json(j)
    assert s2.to_json() == j
    assert s2.version == s.version
    # the source dict was not mutated — including NESTED column dicts
    # (the engine-10 rung pops foreign_key in place)
    assert src["engine_version"] == 2 and "hints" in src
    child_cols = src["tables"]["event_user__parse_data__entities"]
    assert child_cols["_dlt_parent_id"]["foreign_key"] is True
    assert "ghost" in child_cols


def test_attach_engine11_current_reference():
    s = Schema.from_dict(engine11_schema())
    assert s.name == "jaffle"
    assert s.settings["max_nesting"] == 3
    assert s.settings["schema_contract"]["columns"] == "freeze"
    assert s.tables["orders"]["columns"]["meta"]["data_type"] == "json"
    # stored hash is preserved on the chain; version bumped once for the
    # representation change
    assert "abcd1234" in s.previous_hashes and "00ff" in s.previous_hashes
    assert s.version == 8
    assert s.version_hash and s.version_hash != "abcd1234"


def test_engine1_upgrade_path():
    d = {
        "name": "ancient", "engine_version": 1,
        "tables": {"t": {"a": {"name": "a", "data_type": "text",
                               "nullable": True}}},
        "hints": {}, "preferred_types": {},
    }
    s = Schema.from_dict(d)
    assert s.tables["t"]["columns"]["a"]["data_type"] == "text"


def test_unknown_engine_raises():
    with pytest.raises(SchemaEngineNoUpgradePath):
        Schema.from_dict({"name": "x", "engine_version": 99, "tables": {},
                          "normalizers": {}})


def test_native_schemas_bypass_migration():
    s = Schema("native")
    d = s.to_dict()
    assert not looks_like_reference_schema(d)
    s2 = Schema.from_json(s.to_json())
    assert s2.version_hash == s.version_hash
    assert not looks_like_reference_schema(
        __import__("json").loads(s.to_json())
    )


def test_naming_convention_resolved_from_normalizers():
    d = engine11_schema()
    d["normalizers"]["names"] = "dlt.destinations.impl.weaviate.naming"
    s = Schema.from_dict(d)  # unknown convention falls back to default
    assert s.naming.__class__.__name__ == "SnakeCaseNaming"
    d2 = engine11_schema()
    d2["normalizers"]["names"] = "duck_case"
    s2 = Schema.from_dict(d2)
    assert s2.naming.__class__.__name__ == "DuckCaseNaming"


def test_attached_schema_loads_through_pipeline_surface(spark, tmp_path):
    """End-to-end attach: persist an engine-2 schema the way the store
    keeps schemas (yaml), read it back, and evolve it with a load —
    the migrated schema must accept new columns like a native one."""
    import yaml

    p = tmp_path / "event.schema.yaml"
    p.write_text(yaml.safe_dump(engine2_schema(), sort_keys=False))
    s = Schema.from_yaml(p.read_text())
    assert s.tables["event_user"]["columns"]["payload"]["data_type"] == "json"
    before = s.version
    s.update_table({"name": "event_user",
                    "columns": {"new_col": {"name": "new_col",
                                            "data_type": "bigint",
                                            "nullable": True}}})
    s.bump_version()
    assert s.version == before + 1
    assert "new_col" in s.tables["event_user"]["columns"]


def test_minimal_engine1_without_markers_takes_ladder():
    """A minimal engine-1 stored schema may carry NONE of the marker
    keys (hints/preferred_types/includes/excludes) — the flat
    name->columns ``tables`` shape alone must route it to the ladder
    instead of silently ingesting columns dicts as native tables."""
    d = {
        "name": "bare", "engine_version": 1,
        "tables": {"t": {"a": {"name": "a", "data_type": "text",
                               "nullable": True}}},
    }
    assert looks_like_reference_schema(d)
    s = Schema.from_dict(d)
    assert s.tables["t"]["columns"]["a"]["data_type"] == "text"
    # and it came out in native shape, not the flat engine-1 form
    assert "columns" in s.tables["t"]


def test_engine10_rung_pops_generate_dlt_id():
    """Reference migrations.py:179-182 — engine 10 removes
    ``generate_dlt_id`` from the json normalizer config."""
    d = engine2_schema()
    d["engine_version"] = 2
    out = migrate_schema(d, 2, REFERENCE_ENGINE)
    json_cfg = out["normalizers"]["json"]["config"]
    assert "generate_dlt_id" not in json_cfg
    # explicit: a dict entering at engine 9 with the key set loses it
    d2 = {
        "name": "g", "engine_version": 9, "version_hash": "",
        "previous_hashes": [], "tables": {},
        "settings": {"default_hints": {}, "preferred_types": {}},
        "normalizers": {
            "names": "snake_case",
            "json": {"module": "relational",
                     "config": {"generate_dlt_id": True,
                                "propagation": {}}},
        },
    }
    out2 = migrate_schema(d2, 9, REFERENCE_ENGINE)
    assert "generate_dlt_id" not in out2["normalizers"]["json"]["config"]
    assert out2["normalizers"]["json"]["config"]["propagation"] == {}
