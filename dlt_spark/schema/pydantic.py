"""Pydantic model → dlt column schema + per-item validation.

Behavioral re-expression of the reference pydantic integration
(``dlt/common/libs/pydantic.py``: ``pydantic_to_table_schema_columns:189``,
``column_mode_to_extra:300``, ``validate_and_filter_items:543``; and
``dlt/extract/validation.py:34`` ``PydanticValidator``) for the Spark
DataFrame path:

- ``pydantic_to_columns`` derives the dlt column dict (name/data_type/
  nullable) from model fields — drives the declared StructType and the
  schema-contract column checks;
- ``model_validation_step`` returns a DataFrame→DataFrame step that
  enforces the model: column drift per ``column_mode`` (evolve / freeze /
  discard_value, mapped from the model's ``extra`` config exactly like the
  reference), and row validity per ``data_mode`` (evolve / freeze /
  discard_row) by running ``model_validate`` over Arrow batches in
  ``mapInPandas``.

Per-row pydantic validation is inherently Python-side — the reference runs
it per item too.  The batch transfer is Arrow-vectorized and the step only
filters rows (no data rewrite), so the scan/shuffle plan around it is
unchanged.  Models that only declare type shapes (no validators) can skip
``data_mode`` checks entirely and rely on the schema contract.
"""

from __future__ import annotations

import datetime as dt
import decimal
import typing
import uuid
from typing import Any, Dict, Iterable, Optional, Type

try:
    from pydantic import BaseModel

    PYDANTIC_AVAILABLE = True
except ImportError:  # pragma: no cover
    BaseModel = None  # type: ignore[assignment, misc]
    PYDANTIC_AVAILABLE = False


_PY_TO_DLT = {
    str: "text",
    int: "bigint",
    float: "double",
    bool: "bool",
    dt.datetime: "timestamp",
    dt.date: "date",
    dt.time: "time",
    decimal.Decimal: "decimal",
    bytes: "binary",
    bytearray: "binary",
    uuid.UUID: "text",
}


def _require_pydantic() -> None:
    if not PYDANTIC_AVAILABLE:
        raise ImportError(
            "pydantic is required for model-based column schemas; install it"
            " or pass a dict column spec"
        )


def _unwrap_optional(annotation: Any) -> tuple:
    """Return (inner_type, nullable) for Optional[...] / unions with None."""
    origin = typing.get_origin(annotation)
    if origin is typing.Union or str(origin) == "types.UnionType":
        args = [a for a in typing.get_args(annotation) if a is not type(None)]
        nullable = len(args) < len(typing.get_args(annotation))
        # like the reference, a multi-type union collapses to its first
        # member (pydantic.py:236-241)
        return (args[0] if args else Any), nullable
    return annotation, False


def _field_data_type(annotation: Any) -> Optional[str]:
    """Map a python annotation to a dlt data_type; None means 'infer from
    data' (the reference skips Any fields, pydantic.py:247)."""
    if annotation is Any:
        return None
    origin = typing.get_origin(annotation)
    if origin in (list, set, frozenset, tuple, dict):
        return "json"
    if isinstance(annotation, type):
        if BaseModel is not None and issubclass(annotation, BaseModel):
            return "json"
        if issubclass(annotation, (list, set, frozenset, tuple, dict)):
            return "json"
        for py, dlt_t in _PY_TO_DLT.items():
            if issubclass(annotation, py):
                return dlt_t
        return "text"  # unknown classes coerce to text like the reference
    return "text"


def pydantic_to_columns(model: "Type[BaseModel]") -> Dict[str, dict]:
    """Model fields → dlt column dicts keyed by column name
    (reference ``pydantic_to_table_schema_columns``)."""
    _require_pydantic()
    cols: Dict[str, dict] = {}
    for field_name, field in model.model_fields.items():
        name = field.alias or field_name
        inner, nullable = _unwrap_optional(field.annotation)
        data_type = _field_data_type(inner)
        if data_type is None:
            continue  # Any: inferred from data
        cols[name] = {"name": name, "data_type": data_type, "nullable": nullable}
    return cols


def pydantic_to_spark_schema(model: "Type[BaseModel]"):
    """Declared StructType for the model (nullable honored)."""
    from pyspark.sql import types as T

    from .spark_types import to_spark_type

    fields = [
        T.StructField(c["name"], to_spark_type(c), c.get("nullable", True))
        for c in pydantic_to_columns(model).values()
    ]
    return T.StructType(fields)


def extra_to_column_mode(extra: Optional[str]) -> str:
    """Model ``extra`` config → contract column mode (reference
    ``extra_to_column_mode:309``)."""
    return {"allow": "evolve", "forbid": "freeze", "ignore": "discard_value"}.get(
        extra or "", "freeze"
    )


def get_extra_from_model(model: "Type[BaseModel]") -> Optional[str]:
    cfg = getattr(model, "model_config", None) or {}
    return cfg.get("extra")


def model_validation_step(
    model: "Type[BaseModel]",
    column_mode: Optional[str] = None,
    data_mode: str = "freeze",
):
    """DataFrame step enforcing the model (reference PydanticValidator).

    column_mode: evolve (keep extras) | freeze (raise on extras) |
    discard_value (drop extra columns).  Defaults from the model's
    ``extra`` config.  data_mode: evolve (no row checks) | freeze (raise
    on first invalid row) | discard_row (filter invalid rows).
    """
    _require_pydantic()
    if column_mode is None:
        column_mode = extra_to_column_mode(get_extra_from_model(model))
    declared = pydantic_to_columns(model)
    field_names = set(declared)

    def step(df):
        import pandas as pd

        reserved = {c for c in df.columns if c.startswith("_dlt_")}
        extras = [c for c in df.columns if c not in field_names and c not in reserved]
        out = df
        if extras:
            if column_mode == "freeze":
                raise ValueError(
                    f"pydantic contract freeze: extra columns {extras} not in"
                    f" model {model.__name__}"
                )
            if column_mode == "discard_value":
                out = out.drop(*extras)
        if data_mode == "evolve":
            return out

        check_cols = [c for c in out.columns if c in field_names]
        if not check_cols:
            return out
        schema = out.schema
        payload = _dumps_model(model)
        model_name = model.__name__
        cache: list = []

        def validate_batches(batches: Iterable["pd.DataFrame"]):
            if not cache:
                cache.append(_loads_model(payload))
            mdl = cache[0]
            for pdf in batches:
                mask = []
                for row in pdf[check_cols].to_dict("records"):
                    clean = {
                        k: (
                            None
                            if v is None or (isinstance(v, float) and v != v)
                            # Arrow hands array<...> cells to pandas as
                            # numpy.ndarray; pydantic v2 rejects it for
                            # List[...] fields — rehydrate to a plain list
                            else (v.tolist() if hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v)
                        )
                        for k, v in row.items()
                    }
                    try:
                        mdl.model_validate(clean)
                        mask.append(True)
                    except Exception as ex:
                        if data_mode == "freeze":
                            raise ValueError(
                                f"pydantic validation failed for {model_name}:"
                                f" {ex}"
                            ) from ex
                        mask.append(False)
                yield pdf[pd.Series(mask, index=pdf.index)]

        return out.mapInPandas(validate_batches, schema)

    return step


def _dumps_model(model: "Type[BaseModel]") -> bytes:
    """Serialize the model class for executor shipping.  Pydantic stores
    the defining frame's locals in ``__pydantic_parent_namespace__`` (for
    forward-ref rebuilds); that namespace can drag unpicklables like a
    SparkSession into the closure, so it is cleared for the trip."""
    try:
        from pyspark import cloudpickle  # type: ignore[attr-defined]
    except ImportError:
        import pyspark.cloudpickle as cloudpickle  # type: ignore[no-redef]

    saved = getattr(model, "__pydantic_parent_namespace__", None)
    try:
        model.__pydantic_parent_namespace__ = None
        return cloudpickle.dumps(model)
    finally:
        model.__pydantic_parent_namespace__ = saved


def _loads_model(payload: bytes) -> "Type[BaseModel]":
    import pickle

    return pickle.loads(payload)
