"""Logical type system and table-schema model.

Re-expresses the reference's schema typing layer
(``dlt/common/data_types/typing.py:6-18``, ``dlt/common/schema/typing.py``)
for a Spark-native engine.  Tables/columns are plain dicts (JSON-roundtrip
friendly — the stored schema is versioned and hashed, see
``schema.py``), with the same 11 logical data types and the same column
hints, so a user of the reference can carry their schemas over unchanged.
"""

from __future__ import annotations

from typing import Any, Literal, Optional, TypedDict

# --- logical data types (reference dlt/common/data_types/typing.py:6-18) ---
TDataType = Literal[
    "text",
    "double",
    "bool",
    "timestamp",
    "bigint",
    "binary",
    "json",
    "decimal",
    "wei",
    "date",
    "time",
]
DATA_TYPES: frozenset = frozenset(
    ("text", "double", "bool", "timestamp", "bigint", "binary", "json",
     "decimal", "wei", "date", "time")
)

# --- write dispositions (reference dlt/common/schema/typing.py:250) ---
TWriteDisposition = Literal["append", "replace", "merge", "skip"]
TLoaderMergeStrategy = Literal["delete-insert", "upsert", "insert-only", "scd2"]
TLoaderReplaceStrategy = Literal[
    "truncate-and-insert", "insert-from-staging", "staging-optimized"
]

# --- column hints (reference dlt/common/schema/typing.py:65-104) ---
COLUMN_HINTS: tuple = (
    "partition",
    "cluster",
    "primary_key",
    "sort",
    "unique",
    "merge_key",
    "row_key",
    "parent_key",
    "root_key",
    "hard_delete",
    "dedup_sort",
    "incremental",
)


class TColumnSchema(TypedDict, total=False):
    name: str
    data_type: TDataType
    nullable: bool
    precision: int
    scale: int
    timezone: bool
    variant: bool
    # hints
    partition: bool
    cluster: bool
    primary_key: bool
    sort: bool
    unique: bool
    merge_key: bool
    row_key: bool
    parent_key: bool
    root_key: bool
    hard_delete: bool
    dedup_sort: Literal["asc", "desc"]
    incremental: bool


TTableSchemaColumns = dict  # name -> TColumnSchema


class TTableSchema(TypedDict, total=False):
    name: str
    description: str
    write_disposition: TWriteDisposition
    parent: str  # nested-table link (reference typing.py:359-380)
    resource: str
    columns: TTableSchemaColumns
    table_format: str
    x_merge_strategy: TLoaderMergeStrategy
    x_replace_strategy: TLoaderReplaceStrategy
    x_boundary_timestamp: str  # scd2


# schema-contract model (reference dlt/common/schema/typing.py:214-226)
TSchemaContractEntities = Literal["tables", "columns", "data_type"]
TSchemaEvolutionMode = Literal["evolve", "freeze", "discard_value", "discard_row"]
DEFAULT_SCHEMA_CONTRACT: dict = {
    "tables": "evolve",
    "columns": "evolve",
    "data_type": "evolve",
}

# dlt system column names (reference relational.py:60-67)
C_DLT_ID = "_dlt_id"
C_DLT_LOAD_ID = "_dlt_load_id"
C_DLT_PARENT_ID = "_dlt_parent_id"
C_DLT_LIST_IDX = "_dlt_list_idx"
C_DLT_ROOT_ID = "_dlt_root_id"
C_VALUE = "value"  # scalar-list child-table payload column

# scd2 validity columns (reference typing.py:259)
C_DLT_VALID_FROM = "_dlt_valid_from"
C_DLT_VALID_TO = "_dlt_valid_to"

# engine tables
LOADS_TABLE_NAME = "_dlt_loads"
VERSION_TABLE_NAME = "_dlt_version"
STATE_TABLE_NAME = "_dlt_pipeline_state"
DLT_TABLES = frozenset((LOADS_TABLE_NAME, VERSION_TABLE_NAME, STATE_TABLE_NAME))


def new_column(
    name: str,
    data_type: Optional[TDataType] = None,
    nullable: bool = True,
    **hints: Any,
) -> TColumnSchema:
    col: TColumnSchema = {"name": name, "nullable": nullable}
    if data_type is not None:
        if data_type not in DATA_TYPES:
            raise ValueError(f"unknown data type {data_type!r}")
        col["data_type"] = data_type
    for k, v in hints.items():
        if v is not None:
            col[k] = v  # type: ignore[literal-required]
    return col


def new_table(
    name: str,
    parent: Optional[str] = None,
    write_disposition: Optional[TWriteDisposition] = None,
    columns: Optional[list] = None,
    **extra: Any,
) -> TTableSchema:
    tbl: TTableSchema = {"name": name, "columns": {}}
    if parent:
        tbl["parent"] = parent
    elif write_disposition:
        # nested tables inherit the root's disposition (reference utils.py)
        tbl["write_disposition"] = write_disposition
    for c in columns or []:
        tbl["columns"][c["name"]] = c
    for k, v in extra.items():
        if v is not None:
            tbl[k] = v  # type: ignore[literal-required]
    return tbl


def get_columns_with_hint(table: TTableSchema, hint: str) -> list:
    return [c["name"] for c in table.get("columns", {}).values() if c.get(hint)]


def is_nested_table(table: TTableSchema) -> bool:
    return bool(table.get("parent"))
