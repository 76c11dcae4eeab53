"""Python value -> dlt type inference, detections, and value coercion.

Re-expression of the reference's inference/coercion layer
(``dlt/common/data_types/type_helpers.py:31-256``,
``dlt/common/schema/detections.py:16-84``).  This code runs on the
*driver* only for the dict-items ingestion path (``pipeline.run([{...}])``)
— columnar inputs (parquet/Arrow/DataFrame) never touch it; they take the
schema-first Arrow fast path.  Per-partition use inside ``mapInPandas``
is supported for distributed JSON normalization (see
``normalize/json_path.py``); the functions are pure and picklable.
"""

from __future__ import annotations

import base64
import datetime  # noqa: TC003
import json
import re
from decimal import Decimal, InvalidOperation
from typing import Any, Optional, Sequence, Tuple

from .typing import TDataType

# 2**64 // 10**18 wei bounds, mirrors reference detections.py:59-70
_WEI_MAX_PRECISION = 38
_HEX_RE = re.compile(r"^0[xX][0-9a-fA-F]+$")
_ISO_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)
_ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_ISO_TIME_RE = re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d{1,9})?$")


def py_type_to_sc_type(t: type) -> TDataType:
    """Map a Python type to a dlt logical type
    (reference ``type_helpers.py:31-84``: exact map + subclass walk)."""
    import datetime as dt

    if t is bool:
        return "bool"
    if t is int:
        return "bigint"
    if t is float:
        return "double"
    if t is str:
        return "text"
    if t is type(None):
        raise ValueError("cannot infer type of None")
    if t is Decimal:
        return "decimal"
    if t is dt.datetime:
        return "timestamp"
    if t is dt.date:
        return "date"
    if t is dt.time:
        return "time"
    if t in (bytes, bytearray, memoryview):
        return "binary"
    if t in (dict, list, tuple):
        return "json"
    # subclass walk (reference type_helpers.py:47-84)
    if issubclass(t, bool):
        return "bool"
    if issubclass(t, int):
        return "bigint"
    if issubclass(t, float):
        return "double"
    if issubclass(t, Decimal):
        return "decimal"
    if issubclass(t, dt.datetime):
        return "timestamp"
    if issubclass(t, dt.date):
        return "date"
    if issubclass(t, dt.time):
        return "time"
    if issubclass(t, (bytes, bytearray, memoryview)):
        return "binary"
    if issubclass(t, str):
        return "text"
    if issubclass(t, (dict, list, tuple)):
        return "json"
    raise ValueError(f"cannot map python type {t} to a dlt data type")


# --- detections (reference dlt/common/schema/detections.py) ---

def is_iso_timestamp(t: TDataType, v: Any) -> Optional[TDataType]:
    if t == "text" and _ISO_TS_RE.match(v):
        return "timestamp"
    return None


def is_iso_date(t: TDataType, v: Any) -> Optional[TDataType]:
    if t == "text" and _ISO_DATE_RE.match(v):
        return "date"
    return None


def is_timestamp(t: TDataType, v: Any) -> Optional[TDataType]:
    """int/float within ±5y of 'now' treated as epoch seconds
    (reference detections.py:16-30)."""
    if t in ("bigint", "double"):
        import time

        now = time.time()
        if now - 5 * 365 * 86400 < v < now + 5 * 365 * 86400:
            return "timestamp"
    return None


def is_large_integer(t: TDataType, v: Any) -> Optional[TDataType]:
    if t == "bigint" and isinstance(v, int) and (v > 2**63 - 1 or v < -(2**63)):
        return "wei" if len(str(abs(v))) <= _WEI_MAX_PRECISION else "text"
    return None


DETECTIONS = {
    "iso_timestamp": is_iso_timestamp,
    "iso_date": is_iso_date,
    "timestamp": is_timestamp,
    "large_integer": is_large_integer,
}
DEFAULT_DETECTIONS: Sequence[str] = ("iso_timestamp", "iso_date", "large_integer")


def infer_data_type(value: Any, detections: Sequence[str] = DEFAULT_DETECTIONS) -> TDataType:
    t = py_type_to_sc_type(type(value))
    for d in detections:
        out = DETECTIONS[d](t, value)
        if out:
            return out
    return t


# --- coercion (reference type_helpers.py:179-256 dispatch matrix) ---

class CoercionError(ValueError):
    """Raised when a value cannot be coerced to the target type; callers
    fall back to a variant column (reference jsonl.py:355-394)."""


def _parse_iso_datetime(v: str) -> "datetime.datetime":
    import datetime as dt

    s = v.strip().replace(" ", "T", 1)
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    try:
        return dt.datetime.fromisoformat(s)
    except ValueError as e:
        raise CoercionError(str(e)) from e


def coerce_value(to_type: TDataType, from_type: TDataType, value: Any) -> Any:
    """Coerce ``value`` (of dlt type ``from_type``) to ``to_type``.

    Mirrors the reference dispatch matrix entry point
    ``type_helpers.py:237 coerce_value`` — same supported conversions,
    raising :class:`CoercionError` where the reference would spawn a
    variant column."""
    import datetime as dt

    if value is None:
        return None
    if to_type == from_type:
        if to_type == "json" and not isinstance(value, str):
            return json.dumps(value, default=str, sort_keys=True)
        return value

    if to_type == "text":
        if from_type == "binary":
            return base64.b64encode(bytes(value)).decode("ascii")
        if from_type == "json":
            return value if isinstance(value, str) else json.dumps(value, default=str, sort_keys=True)
        return str(value)

    if to_type == "binary":
        if from_type == "text":
            if _HEX_RE.match(value):
                h = value[2:]
                return bytes.fromhex(h if len(h) % 2 == 0 else "0" + h)
            try:
                return base64.b64decode(value, validate=True)
            except Exception as e:
                raise CoercionError(f"cannot decode base64: {value!r}") from e
        if from_type == "bigint":
            # little-endian, wei interop (reference type_helpers.py:193)
            return int(value).to_bytes((int(value).bit_length() + 7) // 8 or 1, "little")
        raise CoercionError(f"{from_type} -> binary")

    if to_type == "bool":
        if from_type == "text":
            s = value.strip().lower()
            if s in ("true", "t", "1", "yes"):
                return True
            if s in ("false", "f", "0", "no"):
                return False
            raise CoercionError(f"not a bool: {value!r}")
        if from_type in ("bigint", "double"):
            return bool(value)
        raise CoercionError(f"{from_type} -> bool")

    if to_type in ("bigint", "double", "decimal", "wei"):
        caster = {"bigint": int, "double": float}.get(to_type, Decimal)
        if from_type == "text":
            s = value.strip()
            try:
                if _HEX_RE.match(s):
                    return caster(int(s, 16))
                if to_type == "bigint":
                    return int(s)
                return caster(s)
            except (ValueError, InvalidOperation) as e:
                raise CoercionError(f"not numeric: {value!r}") from e
        if from_type in ("bigint", "double", "decimal", "wei"):
            if to_type == "bigint" and from_type in ("double", "decimal", "wei"):
                if value != int(value):
                    raise CoercionError(f"fractional -> bigint: {value!r}")
                return int(value)
            return caster(value)
        if from_type == "timestamp":
            epoch = value.timestamp()
            return caster(epoch) if to_type != "bigint" else int(epoch)
        raise CoercionError(f"{from_type} -> {to_type}")

    if to_type == "timestamp":
        if from_type == "text":
            return _parse_iso_datetime(value)
        if from_type in ("bigint", "double"):
            return dt.datetime.fromtimestamp(float(value), tz=dt.timezone.utc)
        if from_type == "date":
            return dt.datetime(value.year, value.month, value.day, tzinfo=dt.timezone.utc)
        raise CoercionError(f"{from_type} -> timestamp")

    if to_type == "date":
        if from_type == "text":
            return _parse_iso_datetime(value).date() if "T" in value or " " in value.strip() else dt.date.fromisoformat(value.strip())
        if from_type == "timestamp":
            return value.date()
        if from_type in ("bigint", "double"):
            return dt.datetime.fromtimestamp(float(value), tz=dt.timezone.utc).date()
        raise CoercionError(f"{from_type} -> date")

    if to_type == "time":
        if from_type == "text":
            if not _ISO_TIME_RE.match(value.strip()):
                raise CoercionError(f"not a time: {value!r}")
            return dt.time.fromisoformat(value.strip())
        raise CoercionError(f"{from_type} -> time")

    if to_type == "json":
        return json.dumps(value, default=str, sort_keys=True)

    raise CoercionError(f"{from_type} -> {to_type}")


def coerce_or_variant(
    to_type: TDataType, from_type: TDataType, value: Any
) -> Tuple[Any, Optional[TDataType]]:
    """Try coercion; on failure return ``(value, from_type)`` signalling the
    caller to route the value into a ``col__v_<type>`` variant column."""
    try:
        return coerce_value(to_type, from_type, value), None
    except CoercionError:
        return value, from_type
