"""Versioned, content-hashed, contract-governed schema.

Re-expression of the reference schema system
(``dlt/common/schema/schema.py``, ``utils.py:198-249`` version hashing,
``utils.py:499/595`` column/table merging, ``schema.py:177-318`` contract
enforcement).  The stored form is a plain JSON-able dict kept verbatim in
the ``_dlt_version`` table — Spark's catalog does not version schemas, so
the engine does (SURVEY §1.3).
"""

from __future__ import annotations

import base64
import hashlib
import json
from typing import Any, Iterable, Optional

from .naming import SnakeCaseNaming
from .typing import (
    DEFAULT_SCHEMA_CONTRACT,
    DLT_TABLES,
    TColumnSchema,
    TTableSchema,
    new_table,
)

ENGINE_VERSION = 1


class SchemaContractViolation(Exception):
    def __init__(self, entity: str, table: str, item: str, mode: str) -> None:
        self.entity, self.table, self.item, self.mode = entity, table, item, mode
        super().__init__(
            f"schema contract '{entity}:{mode}' violated on table"
            f" {table!r} by {item!r}"
        )


def _canonical_json(obj: Any) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)


def version_hash(stored: dict) -> str:
    """Content hash of tables+settings+name — base64(sha3_256)[:16ch]
    analog of reference ``utils.py:198-249`` (recipe is ours; property —
    deterministic, content-addressed — is the same)."""
    content = _canonical_json(
        {
            "name": stored.get("name"),
            "tables": stored.get("tables", {}),
            "settings": stored.get("settings", {}),
        }
    )
    digest = hashlib.sha3_256(content.encode("utf-8")).digest()
    return base64.b64encode(digest).decode("ascii")[:16]


def diff_table(existing: TTableSchema, partial: TTableSchema) -> TTableSchema:
    """Columns/props present in ``partial`` but absent (or re-typed) in
    ``existing`` (reference ``utils.py:561 diff_table``)."""
    delta: TTableSchema = {"name": partial["name"], "columns": {}}
    for name, col in partial.get("columns", {}).items():
        ex = existing.get("columns", {}).get(name)
        if ex is None or _col_type_tuple(ex) != _col_type_tuple(col):
            delta["columns"][name] = col
    for k, v in partial.items():
        if k in ("name", "columns"):
            continue
        if existing.get(k) != v:
            delta[k] = v  # type: ignore[literal-required]
    return delta


def _col_type_tuple(col: TColumnSchema) -> tuple:
    return (
        col.get("data_type"),
        col.get("precision"),
        col.get("scale"),
        col.get("timezone"),
    )


def merge_columns(
    existing: dict, new_cols: dict, merge_defaults: bool = True
) -> dict:
    """In-place merge of column dicts (reference ``utils.py:499``)."""
    for name, col in new_cols.items():
        if name in existing:
            merged = dict(existing[name])
            for k, v in col.items():
                if merge_defaults or v is not None:
                    merged[k] = v
            existing[name] = merged
        else:
            existing[name] = dict(col)
    return existing


def merge_table(existing: TTableSchema, partial: TTableSchema) -> TTableSchema:
    """Merge a partial table into an existing one
    (reference ``utils.py:595 merge_table``)."""
    merge_columns(existing.setdefault("columns", {}), partial.get("columns", {}))
    for k, v in partial.items():
        if k not in ("columns",):
            existing[k] = v  # type: ignore[literal-required]
    return existing


class Schema:
    """Named, versioned collection of table schemas."""

    def __init__(
        self,
        name: str,
        naming: Optional[SnakeCaseNaming] = None,
        max_nesting: int = 100,
        contract: Optional[dict] = None,
    ) -> None:
        self.naming = naming or SnakeCaseNaming()
        self.name = self.naming.normalize_table_identifier(name)
        self.tables: dict = {}
        self.settings: dict = {
            "schema_contract": dict(contract or DEFAULT_SCHEMA_CONTRACT),
            "max_nesting": max_nesting,
            "default_hints": {
                # column-name regex -> hint (reference typing.py:389-393)
                "row_key": [r"^_dlt_id$"],
                "parent_key": [r"^_dlt_parent_id$"],
                "root_key": [r"^_dlt_root_id$"],
            },
        }
        self.version = 1
        self._version_hash = version_hash(self.to_dict())
        self.previous_hashes: list = []

    # -- versioning (reference utils.py:198 bump_version_if_modified) --

    @property
    def version_hash(self) -> str:
        return self._version_hash

    def bump_version(self) -> bool:
        new_hash = version_hash(self.to_dict())
        if new_hash != self._version_hash:
            self.previous_hashes.append(self._version_hash)
            self._version_hash = new_hash
            self.version += 1
            return True
        return False

    # -- tables --

    def get_table(self, name: str) -> TTableSchema:
        return self.tables[name]

    def has_table(self, name: str) -> bool:
        return name in self.tables

    def data_tables(self) -> list:
        return [t for n, t in self.tables.items() if n not in DLT_TABLES]

    def data_table_names(self) -> list:
        return [t["name"] for t in self.data_tables()]

    def root_table(self, name: str) -> TTableSchema:
        t = self.tables[name]
        while t.get("parent"):
            t = self.tables[t["parent"]]
        return t

    def child_tables(self, name: str) -> list:
        """Direct + transitive nested tables, ancestry order
        (reference sql_jobs.py:48-75 table chains)."""
        out: list = []
        frontier = [name]
        while frontier:
            parent = frontier.pop(0)
            for t in self.tables.values():
                if t.get("parent") == parent:
                    out.append(t)
                    frontier.append(t["name"])
        return out

    def table_chain(self, root_name: str) -> list:
        return [self.tables[root_name]] + self.child_tables(root_name)

    def update_table(
        self, partial: TTableSchema, apply_contract: bool = True
    ) -> TTableSchema:
        """Merge a partial table under contract rules; returns the merged
        table.  Contract semantics per reference ``schema.py:177-318``."""
        name = partial["name"]
        contract = self.resolve_contract(name)
        is_new_table = name not in self.tables
        if is_new_table:
            if apply_contract and contract["tables"] == "freeze":
                raise SchemaContractViolation("tables", name, name, "freeze")
            if apply_contract and contract["tables"] in ("discard_row", "discard_value"):
                return new_table(name)  # signal: drop data for unknown table
            self.tables[name] = new_table(
                name, parent=partial.get("parent")
            )
        existing = self.tables[name]
        # a newly-allowed table brings its initial columns with it — the
        # columns contract governs *subsequent* drift (reference
        # schema.py:177-318: the new-table decision covers its columns)
        if apply_contract and not is_new_table:
            filtered_cols = {}
            for cname, col in partial.get("columns", {}).items():
                ex = existing.get("columns", {}).get(cname)
                if ex is None:
                    mode = contract["columns"]
                    if mode == "freeze":
                        raise SchemaContractViolation("columns", name, cname, "freeze")
                    if mode in ("discard_row", "discard_value"):
                        continue
                elif col.get("variant") and _col_type_tuple(ex) != _col_type_tuple(col):
                    mode = contract["data_type"]
                    if mode == "freeze":
                        raise SchemaContractViolation("data_type", name, cname, "freeze")
                    if mode in ("discard_row", "discard_value"):
                        continue
                filtered_cols[cname] = col
            partial = dict(partial)  # type: ignore[assignment]
            partial["columns"] = filtered_cols
        merge_table(existing, partial)
        return existing

    def infer_hints(self, col_name: str) -> dict:
        """Default hints by column-name regex (reference
        ``Schema._infer_hint`` ``schema.py:984``, settings
        ``typing.py:389-393``)."""
        import re

        out: dict = {}
        for hint, patterns in self.settings.get("default_hints", {}).items():
            for p in patterns:
                if re.search(p, col_name):
                    out[hint] = True
                    break
        return out

    def preferred_type(self, col_name: str):
        """Preferred data type by column-name regex (reference
        ``typing.py:393``, ``schema.py:626``)."""
        import re

        for p, dtype in self.settings.get("preferred_types", {}).items():
            if re.search(p, col_name):
                return dtype
        return None

    def resolve_contract(self, table_name: str) -> dict:
        """Contract inherits root -> nested table (reference schema.py:331)."""
        contract = dict(self.settings.get("schema_contract", DEFAULT_SCHEMA_CONTRACT))
        root: Optional[TTableSchema] = None
        if table_name in self.tables:
            root = self.root_table(table_name)
        tbl_contract = (root or {}).get("schema_contract")  # type: ignore[union-attr]
        if isinstance(tbl_contract, str):
            contract = {k: tbl_contract for k in contract}
        elif isinstance(tbl_contract, dict):
            contract.update(tbl_contract)
        return contract

    # -- (de)serialization --

    def to_dict(self) -> dict:
        return {
            "engine_version": ENGINE_VERSION,
            "name": self.name,
            "tables": self.tables,
            "settings": self.settings,
        }

    def to_json(self) -> str:
        d = self.to_dict()
        d["version"] = self.version
        d["version_hash"] = self._version_hash
        d["previous_hashes"] = self.previous_hashes
        return _canonical_json(d)

    @classmethod
    def from_dict(cls, d: dict) -> "Schema":
        from .migrations import (
            looks_like_reference_schema,
            upgrade_reference_schema,
        )

        if looks_like_reference_schema(d):
            # written by another engine build — run the engine-version
            # ladder (reference migrations.py:41), then adapt
            return upgrade_reference_schema(d)
        s = cls(d["name"])
        s.tables = d.get("tables", {})
        s.settings = d.get("settings", s.settings)
        s.version = d.get("version", 1)
        s._version_hash = d.get("version_hash") or version_hash(s.to_dict())
        s.previous_hashes = d.get("previous_hashes", [])
        return s

    @classmethod
    def from_json(cls, j: str) -> "Schema":
        return cls.from_dict(json.loads(j))

    def to_pretty_yaml(self) -> str:
        """YAML form for checking a schema into git (reference
        ``schema.py:815 to_pretty_yaml``).  Roundtrips through
        :meth:`from_yaml` preserving the version hash chain."""
        import yaml

        d = self.to_dict()
        d["version"] = self.version
        d["version_hash"] = self.version_hash
        d["previous_hashes"] = self.previous_hashes
        return yaml.safe_dump(d, sort_keys=False, allow_unicode=True)

    @classmethod
    def from_yaml(cls, text: str) -> "Schema":
        import yaml

        return cls.from_dict(yaml.safe_load(text))

    # -- export (reference schema.py:823-930) --

    def to_mermaid(self) -> str:
        lines = ["erDiagram"]
        for t in self.data_tables():
            lines.append(f"    {t['name']} {{")
            for c in t.get("columns", {}).values():
                lines.append(f"        {c.get('data_type', 'unknown')} {c['name']}")
            lines.append("    }")
            if t.get("parent"):
                lines.append(f"    {t['parent']} ||--o{{ {t['name']} : contains")
        return "\n".join(lines)

    def to_dot(self) -> str:
        lines = ["digraph schema {", "  node [shape=record];"]
        for t in self.data_tables():
            cols = "|".join(
                f"{c['name']}: {c.get('data_type', '?')}"
                for c in t.get("columns", {}).values()
            )
            lines.append(f'  "{t["name"]}" [label="{t["name"]}|{cols}"];')
            if t.get("parent"):
                lines.append(f'  "{t["parent"]}" -> "{t["name"]}";')
        lines.append("}")
        return "\n".join(lines)

    def to_dbml(self) -> str:
        out = []
        for t in self.data_tables():
            cols = "\n".join(
                f"  {c['name']} {c.get('data_type', 'unknown')}"
                for c in t.get("columns", {}).values()
            )
            out.append(f"Table {t['name']} {{\n{cols}\n}}")
            if t.get("parent"):
                out.append(
                    f"Ref: {t['name']}._dlt_parent_id > {t['parent']}._dlt_id"
                )
        return "\n\n".join(out)
