"""Stored-schema engine-version migration.

A user attaching this engine to a dataset whose schema was written by an
older dlt build gets the stored dict upgraded through the same semantic
ladder the reference applies (behavioral reference:
``dlt/common/schema/migrations.py:41 migrate_schema``, engine ladder
1 -> 11).  The ladder here operates on the REFERENCE's stored format and
ends at reference engine 11; :func:`upgrade_reference_schema` then adapts
the engine-11 dict into this repo's :class:`~dlt_spark.schema.Schema`
(naming convention resolved from the normalizers block, simple-regex
``re:`` hints unwrapped, version-hash chain preserved with the stored
hash pushed onto ``previous_hashes``).

Schemas written by THIS engine carry ``engine_version == 1`` and a
``settings`` block; reference-written schemas are recognized
structurally (``normalizers`` block, top-level ``hints`` /
``preferred_types`` / ``includes`` / ``excludes``, or an engine stamp
above ours) — :func:`looks_like_reference_schema`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

from .typing import (
    LOADS_TABLE_NAME,
    VERSION_TABLE_NAME,
    new_column,
    new_table,
)

#: newest reference stored-schema engine this ladder understands
#: (reference ``migrations.py`` tops out at 11 as of dlt 1.x)
REFERENCE_ENGINE = 11

#: oldest engine with an upgrade path (the reference migrates from 1)
MIN_ENGINE = 1


class SchemaEngineNoUpgradePath(Exception):
    """No migration path from the stored engine version (reference
    ``exceptions.py SchemaEngineNoUpgradePathException``)."""

    def __init__(self, name: str, stored: Any, reached: int, target: int):
        self.schema_name, self.stored, self.reached, self.target = (
            name, stored, reached, target,
        )
        super().__init__(
            f"schema {name!r}: no upgrade path from stored engine "
            f"{stored!r} (reached {reached}, target {target})"
        )


def _version_table() -> dict:
    """The ``_dlt_version`` table definition installed by the engine-5
    migration (reference ``utils.py version_table``)."""
    return new_table(
        VERSION_TABLE_NAME,
        columns=[
            new_column("version", "bigint", nullable=False),
            new_column("engine_version", "bigint", nullable=False),
            new_column("inserted_at", "timestamp", nullable=False),
            new_column("schema_name", "text", nullable=False),
            new_column("version_hash", "text", nullable=False),
            new_column("schema", "text", nullable=False),
        ],
        description="Created by DLT. Tracks schema updates",
    )


def _loads_table() -> dict:
    """The ``_dlt_loads`` table definition installed by the engine-5/6
    migrations (reference ``utils.py loads_table``)."""
    return new_table(
        LOADS_TABLE_NAME,
        columns=[
            new_column("load_id", "text", nullable=False),
            new_column("schema_name", "text"),
            new_column("status", "bigint", nullable=False),
            new_column("inserted_at", "timestamp", nullable=False),
            new_column("schema_version_hash", "text"),
        ],
        description="Created by DLT. Tracks completed loads",
    )


def _find_parent(name: str, all_names) -> Optional[str]:
    """Nested-table parent detection for the engine-3 repackaging: walk
    ``__`` separators right-to-left until an existing table matches
    (reference ``migrations.py:75-87``)."""
    parent = name
    while True:
        idx = parent.rfind("__")
        if idx > 0:
            parent = parent[:idx]
            if parent not in all_names:
                continue
            return parent
        return None


def _remove_seen_null_first(d: dict) -> None:
    """Strip the legacy ``seen-null-first`` normalizer hint: incomplete
    columns carrying it are dropped, complete ones keep the column and
    lose the hint (reference ``migrations.py:23``)."""
    for table in d.get("tables", {}).values():
        for col_name, col in list(table.get("columns", {}).items()):
            x_norm = col.get("x-normalizer", {})
            if x_norm.get("seen-null-first"):
                if "data_type" in col:
                    x_norm.pop("seen-null-first", None)
                    if not x_norm:
                        col.pop("x-normalizer", None)
                else:
                    table["columns"].pop(col_name)


def migrate_schema(d: dict, from_engine: int, to_engine: int = REFERENCE_ENGINE) -> dict:
    """Upgrade a reference-format stored schema dict in place from
    ``from_engine`` to ``to_engine``, mirroring each rung of the
    reference ladder (``migrations.py:41``).  Raises
    :class:`SchemaEngineNoUpgradePath` when the ladder cannot reach
    ``to_engine``."""
    if from_engine == 1 and to_engine > 1:
        # engine 2 made include/exclude filters explicit (ref :43)
        d.setdefault("includes", [])
        d.setdefault("excludes", [])
        from_engine = 2
    if from_engine == 2 and to_engine > 2:
        # engine 3: the big repackage (ref :47-108) — normalizers block,
        # settings with simple-regex hints, tables become table schemas
        # with detected parents, filters move onto their root tables
        d["normalizers"] = {
            "names": "snake_case",
            "json": {
                "module": "relational",
                "config": {"propagation": {"root": {"_dlt_id": "_dlt_root_id"}}},
            },
        }
        hints: Dict[str, list] = d.pop("hints", {})
        d["settings"] = {
            "default_hints": {
                h: ["re:" + r for r in rs] for h, rs in hints.items()
            },
            "preferred_types": {
                "re:" + k: v for k, v in d.pop("preferred_types", {}).items()
            },
        }
        old_tables: Dict[str, dict] = d.pop("tables", {})
        d["tables"] = {}
        for name, columns in old_tables.items():
            nt = new_table(name, _find_parent(name, old_tables))
            nt["columns"] = columns
            d["tables"][name] = nt
        for group in ("excludes", "includes"):
            for f in d.pop(group, []):
                # filters were rooted regexes "^root__path" (ref :93-105)
                root = f[1:f.find("__")]
                path = f[f.find("__") + 2:]
                t = d["tables"].setdefault(root, new_table(root))
                t.setdefault("filters", {}).setdefault(group, []).append(
                    "re:^" + path
                )
        from_engine = 3
    if from_engine == 3 and to_engine > 3:
        # engine 4 made the version hash mandatory (ref :110)
        d.setdefault("version_hash", "")
        from_engine = 4
    if from_engine == 4 and to_engine > 4:
        # engine 5 installed the version + loads engine tables (ref :114)
        d["tables"][VERSION_TABLE_NAME] = _version_table()
        d["tables"][LOADS_TABLE_NAME] = _loads_table()
        from_engine = 5
    if from_engine == 5 and to_engine > 5:
        # engine 6 revised the loads table (ref :120)
        d["tables"][LOADS_TABLE_NAME] = _loads_table()
        from_engine = 6
    if from_engine == 6 and to_engine > 6:
        # engine 7 replaced sealed flags with contract settings (ref :124)
        d.get("settings", {}).pop("schema_sealed", None)
        for table in d["tables"].values():
            table.pop("table_sealed", None)
        from_engine = 7
    if from_engine == 7 and to_engine > 7:
        # engine 8 started the version-hash chain (ref :130)
        d["previous_hashes"] = []
        from_engine = 8
    if from_engine == 8 and to_engine > 8:
        # engine 9 marked tables that have materialized rows (ref :133)
        for table in d["tables"].values():
            if "_dlt_id" in table.get("columns", {}):
                table.setdefault("x-normalizer", {})["seen-data"] = True
        from_engine = 9
    if from_engine == 9 and to_engine > 9:
        # engine 10: complex -> json, row/parent key hints replace
        # foreign_key (ref :141-183)
        for table in d["tables"].values():
            cols = table.get("columns", {})
            for col in cols.values():
                if col.get("data_type") == "complex":
                    col["data_type"] = "json"
            if dlt_id := cols.get("_dlt_id"):
                dlt_id["row_key"] = dlt_id.get("unique", False)
            if parent_id := cols.get("_dlt_parent_id"):
                parent_id["parent_key"] = parent_id.get("foreign_key", False)
            for col in cols.values():
                col.pop("foreign_key", None)
        settings = d.get("settings", {})
        for k, v in list(settings.get("preferred_types", {}).items()):
            if v == "complex":
                settings["preferred_types"][k] = "json"
        if (default_hints := settings.get("default_hints")) is not None:
            default_hints.pop("foreign_key", None)
            default_hints["row_key"] = ["_dlt_id"]
            default_hints["parent_key"] = ["_dlt_parent_id"]
        # engine 10 also dropped generate_dlt_id from the json
        # normalizer config (ref :179-182)
        if json_norm := d.get("normalizers", {}).get("json"):
            if json_config := json_norm.get("config"):
                json_config.pop("generate_dlt_id", None)
        from_engine = 10
    if from_engine == 10 and to_engine > 10:
        # engine 11 pinned legacy path-breaking off (ref :186)
        d["normalizers"]["use_break_path_on_normalize"] = False
        from_engine = 11

    d["engine_version"] = from_engine
    if from_engine != to_engine:
        raise SchemaEngineNoUpgradePath(
            d.get("name", "<unnamed>"), d.get("engine_version"),
            from_engine, to_engine,
        )
    _remove_seen_null_first(d)
    return d


def looks_like_reference_schema(d: dict) -> bool:
    """Structural dispatch: this engine's own stored dicts are
    ``engine_version == 1`` with a ``settings`` block and table schemas;
    anything with a reference-only marker (normalizers block, top-level
    hints / preferred_types / includes / excludes, or a higher engine
    stamp) is a reference-written schema that needs the ladder."""
    if any(k in d for k in ("normalizers", "hints", "preferred_types",
                            "includes", "excludes")):
        return True
    try:
        if int(d.get("engine_version", 1)) > 1:
            return True
    except (TypeError, ValueError):
        return False
    # a minimal reference engine-1/2 dict may carry NONE of the marker
    # keys; its ``tables`` block is a flat name -> columns mapping, so
    # any table value missing the native table-schema shape ("columns"
    # key) marks it as reference-written too
    tables = d.get("tables")
    if isinstance(tables, dict) and tables:
        return any(
            not (isinstance(t, dict) and "columns" in t)
            for t in tables.values()
        )
    return False


_SIMPLE_REGEX = re.compile(r"^re:")


def _unwrap_simple_regex(pattern: str) -> str:
    """Reference simple-regexes are ``re:<regex>`` or a bare identifier
    meaning exact match (reference ``typing.py TSimpleRegex``); this
    repo's hint/preferred-type engines take plain regexes."""
    if _SIMPLE_REGEX.match(pattern):
        return pattern[3:]
    return "^" + re.escape(pattern) + "$"


def upgrade_reference_schema(d: dict) -> "Any":
    """Attach path: take a reference-format stored schema at ANY ladder
    engine, upgrade it to reference engine 11, and adapt it into this
    repo's :class:`Schema`.  The stored version-hash chain is preserved
    — the representation changes, so the stored hash is pushed onto
    ``previous_hashes`` and a fresh hash is computed over the adapted
    form (same contract as ``bump_version`` after a content change)."""
    from .naming import NAMING_CONVENTIONS
    from .schema import Schema

    import copy

    # the ladder mutates nested table/column dicts — never the caller's
    d = copy.deepcopy(d)
    from_engine = int(d.get("engine_version", 1))
    if not (MIN_ENGINE <= from_engine <= REFERENCE_ENGINE):
        raise SchemaEngineNoUpgradePath(
            d.get("name", "<unnamed>"), d.get("engine_version"),
            from_engine, REFERENCE_ENGINE,
        )
    migrate_schema(d, from_engine, REFERENCE_ENGINE)

    # naming convention from the normalizers block: module paths end in
    # the convention name ("dlt.common.normalizers.names.snake_case")
    names = (d.get("normalizers") or {}).get("names") or "snake_case"
    convention = names.rsplit(".", 1)[-1]
    naming_cls = NAMING_CONVENTIONS.get(convention)
    naming = naming_cls() if naming_cls else None

    s = Schema(d.get("name", "schema"), naming=naming)
    s.tables = d.get("tables", {})
    settings = d.get("settings", {}) or {}
    if hints := settings.get("default_hints"):
        s.settings["default_hints"] = {
            h: [_unwrap_simple_regex(p) for p in ps] for h, ps in hints.items()
        }
    if preferred := settings.get("preferred_types"):
        s.settings["preferred_types"] = {
            _unwrap_simple_regex(k): v for k, v in preferred.items()
        }
    if contract := settings.get("schema_contract"):
        if isinstance(contract, str):
            contract = {k: contract for k in s.settings["schema_contract"]}
        s.settings["schema_contract"].update(contract)
    json_config = ((d.get("normalizers") or {}).get("json") or {}).get("config") or {}
    if (nesting := json_config.get("max_nesting")) is not None:
        s.settings["max_nesting"] = nesting

    s.version = int(d.get("version", 1))
    prev = list(d.get("previous_hashes", []))
    stored_hash = d.get("version_hash")
    from .schema import version_hash as _vh

    new_hash = _vh(s.to_dict())
    if stored_hash and stored_hash != new_hash:
        prev.append(stored_hash)
        s.version += 1
    s.previous_hashes = prev
    s._version_hash = new_hash
    return s
