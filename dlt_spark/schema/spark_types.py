"""dlt logical types <-> Spark SQL types.

Mapping table from SURVEY.md §1.2 (reference
``dlt/common/data_types/typing.py``, ``dlt/common/libs/pyarrow.py:301``).
``time`` has no Spark type — stored as ``LongType`` microseconds-since-
midnight (documented, one-way convertible to ISO text).  ``wei`` (256-bit
EVM integer) is stored as ``DecimalType(38,0)``; values beyond 38 digits
overflow to text via the variant mechanism, mirroring the reference's
``detections.py:59-70`` fallback.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import types as T

from .typing import TColumnSchema, TDataType

DEFAULT_DECIMAL = (38, 9)
WEI_DECIMAL = (38, 0)


def variant_supported() -> bool:
    """True when the runtime has Spark 4's ``VariantType`` (SURVEY §4's
    one flagged worthwhile engine extension for the dlt ``json`` type)."""
    return hasattr(T, "VariantType")


def to_spark_type(col: TColumnSchema, json_as_variant: bool = False) -> T.DataType:
    dt: Optional[TDataType] = col.get("data_type")
    precision = col.get("precision")
    scale = col.get("scale")
    if dt == "text":
        return T.StringType()
    if dt == "double":
        return T.DoubleType()
    if dt == "bool":
        return T.BooleanType()
    if dt == "timestamp":
        # timezone=False -> NTZ (reference typing.py:164 timezone flag)
        if col.get("timezone") is False:
            return T.TimestampNTZType()
        return T.TimestampType()
    if dt == "bigint":
        if precision is not None:
            if precision <= 8:
                return T.ByteType()
            if precision <= 16:
                return T.ShortType()
            if precision <= 32:
                return T.IntegerType()
        return T.LongType()
    if dt == "binary":
        return T.BinaryType()
    if dt == "json":
        # Spark 4 VariantType behind an opt-in gate: binary-encoded,
        # typed `variant_get` access with shredded parquet stats — the
        # schema-on-read answer to parse-per-access.  DEFAULT stays
        # serialized JSON text (the reference's own storage behavior)
        # because variant parquet is not engine-portable yet (DuckDB
        # cannot read the shredded encoding — measured r8), and the
        # store's files must stay readable by external engines.
        if json_as_variant and variant_supported():
            return T.VariantType()
        return T.StringType()
    if dt == "decimal":
        p, s = precision or DEFAULT_DECIMAL[0], scale if scale is not None else DEFAULT_DECIMAL[1]
        return T.DecimalType(p, s)
    if dt == "wei":
        return T.DecimalType(*WEI_DECIMAL)
    if dt == "date":
        return T.DateType()
    if dt == "time":
        return T.LongType()  # microseconds since midnight
    if dt is None:
        # null-only column awaiting late typing (reference jsonl.py:315-327)
        return T.StringType()
    raise ValueError(f"unknown dlt data type {dt!r}")


def from_spark_type(spark_type: T.DataType) -> TColumnSchema:
    """Infer a dlt column-type dict from a Spark type (used when ingesting
    existing DataFrames / parquet — the Arrow fast path)."""
    col: TColumnSchema = {}
    if isinstance(spark_type, T.StringType):
        col["data_type"] = "text"
    elif isinstance(spark_type, (T.VarcharType, T.CharType)):
        col["data_type"] = "text"
        col["precision"] = spark_type.length
    elif isinstance(spark_type, T.DoubleType) or isinstance(spark_type, T.FloatType):
        col["data_type"] = "double"
    elif isinstance(spark_type, T.BooleanType):
        col["data_type"] = "bool"
    elif isinstance(spark_type, T.TimestampType):
        col["data_type"] = "timestamp"
    elif isinstance(spark_type, T.TimestampNTZType):
        col["data_type"] = "timestamp"
        col["timezone"] = False
    elif isinstance(spark_type, T.ByteType):
        col["data_type"] = "bigint"
        col["precision"] = 8
    elif isinstance(spark_type, T.ShortType):
        col["data_type"] = "bigint"
        col["precision"] = 16
    elif isinstance(spark_type, T.IntegerType):
        col["data_type"] = "bigint"
        col["precision"] = 32
    elif isinstance(spark_type, T.LongType):
        col["data_type"] = "bigint"
    elif isinstance(spark_type, T.BinaryType):
        col["data_type"] = "binary"
    elif isinstance(spark_type, T.DecimalType):
        col["data_type"] = "decimal"
        col["precision"] = spark_type.precision
        col["scale"] = spark_type.scale
    elif isinstance(spark_type, T.DateType):
        col["data_type"] = "date"
    elif isinstance(spark_type, (T.ArrayType, T.MapType, T.StructType)):
        # complex values that survive normalization (max_nesting cutoff)
        # are carried as serialized JSON text
        col["data_type"] = "json"
    elif variant_supported() and isinstance(spark_type, T.VariantType):
        col["data_type"] = "json"
    else:
        col["data_type"] = "text"
    return col


def to_struct_type(columns: dict) -> T.StructType:
    """TTableSchemaColumns -> StructType, hints carried in field metadata."""
    fields = []
    for name, col in columns.items():
        meta = {k: v for k, v in col.items() if k not in ("name", "data_type", "nullable")}
        fields.append(
            T.StructField(
                name,
                to_spark_type(col),
                col.get("nullable", True),
                metadata=meta or None,
            )
        )
    return T.StructType(fields)
