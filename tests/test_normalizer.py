"""Relational normalizer tests — the F2 nested_events fixture from
FIXTURES.md (model: reference tests/common/normalizers/test_json_relational.py)."""

import pytest

from dlt_spark.normalize.relational import RelationalNormalizer
from dlt_spark.pipeline.resources import _dicts_to_df

F2_DOC = {
    "event_id": 123,
    "sender_id": "s-1",
    "timestamp": "2023-01-01T10:00:00Z",
    "metadata": {"bot": {"name": "x", "version": 2}},
    "parse_data": {
        "intent": {"name": "greet", "confidence": 0.99},
        "entities": [
            {"type": "city", "value": "berlin", "scores": [0.1, 0.2]},
            {"type": "name", "value": "alice", "scores": [0.9]},
        ],
    },
    "tags": ["a", "b", "c"],
    "matrix": [[1, 2], [3]],
    "CamelCase Key!": 1,
}


@pytest.fixture(scope="module")
def normalized(spark):
    df = _dicts_to_df(spark, [F2_DOC])
    norm = RelationalNormalizer(root_key=True)
    return norm.normalize(df, "events", load_id="1700000000.000001", row_id_type="key_hash", primary_key=["event_id"])


def test_root_flattening(normalized):
    root = normalized["events"]
    cols = set(root.columns)
    assert "metadata__bot__name" in cols
    assert "metadata__bot__version" in cols
    assert "parse_data__intent__confidence" in cols
    assert "camel_case_keyx" in cols
    assert "_dlt_id" in cols and "_dlt_load_id" in cols
    # arrays moved out to child tables
    assert "tags" not in cols and "matrix" not in cols
    row = root.collect()[0]
    assert row["metadata__bot__name"] == "x"
    assert row["parse_data__intent__name"] == "greet"
    assert row["_dlt_load_id"] == "1700000000.000001"


def test_child_tables_exist(normalized):
    assert "events__tags" in normalized
    assert "events__parse_data__entities" in normalized
    assert "events__parse_data__entities__scores" in normalized
    assert "events__matrix" in normalized


def test_scalar_list_child(normalized):
    tags = normalized["events__tags"].orderBy("_dlt_list_idx").collect()
    assert [r["value"] for r in tags] == ["a", "b", "c"]
    assert [r["_dlt_list_idx"] for r in tags] == [0, 1, 2]
    root_id = normalized["events"].collect()[0]["_dlt_id"]
    assert all(r["_dlt_parent_id"] == root_id for r in tags)
    assert all(r["_dlt_root_id"] == root_id for r in tags)


def test_struct_list_child_and_grandchild(normalized):
    ents = normalized["events__parse_data__entities"].orderBy("_dlt_list_idx").collect()
    assert [e["type"] for e in ents] == ["city", "name"]
    assert [e["value"] for e in ents] == ["berlin", "alice"]
    scores = (
        normalized["events__parse_data__entities__scores"]
        .orderBy("_dlt_parent_id", "_dlt_list_idx")
        .collect()
    )
    assert sorted(s["value"] for s in scores) == [0.1, 0.2, 0.9]
    # grandchild parent ids point at entity rows
    ent_ids = {e["_dlt_id"] for e in ents}
    assert {s["_dlt_parent_id"] for s in scores} <= ent_ids
    # root id propagated two levels down
    root_id = normalized["events"].collect()[0]["_dlt_id"]
    assert all(s["_dlt_root_id"] == root_id for s in scores)


def test_list_of_lists(normalized):
    outer = normalized["events__matrix"].orderBy("_dlt_list_idx").collect()
    assert len(outer) == 2
    inner_name = [k for k in normalized if k.startswith("events__matrix__")][0]
    inner = normalized[inner_name].collect()
    assert sorted(r["value"] for r in inner) == [1, 2, 3]


def test_deterministic_ids(spark):
    df = _dicts_to_df(spark, [F2_DOC])
    norm = RelationalNormalizer(root_key=True)
    a = norm.normalize(df, "events", row_id_type="key_hash", primary_key=["event_id"])
    b = norm.normalize(df, "events", row_id_type="key_hash", primary_key=["event_id"])
    ida = a["events__tags"].orderBy("_dlt_list_idx").collect()
    idb = b["events__tags"].orderBy("_dlt_list_idx").collect()
    assert [r["_dlt_id"] for r in ida] == [r["_dlt_id"] for r in idb]


def test_max_nesting_keeps_json(spark):
    df = _dicts_to_df(spark, [{"id": 1, "deep": {"a": {"b": {"c": [1, 2]}}}}])
    norm = RelationalNormalizer(max_nesting=0)
    out = norm.normalize(df, "t", row_id_type="key_hash", primary_key=["id"])
    assert set(out) == {"t"}
    row = out["t"].collect()[0]
    json_cols = [c for c in out["t"].columns if c.startswith("deep")]
    assert json_cols, out["t"].columns
