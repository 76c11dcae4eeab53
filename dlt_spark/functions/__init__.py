"""Scalar function layer (SURVEY §2.I): the reference's coercion/parse
helpers (``dlt/common/data_types/type_helpers.py:91-233``,
``dlt/common/utils.py`` digest128, ``dlt/common/jsonpath.py``) as Spark
``Column`` expressions — JVM-side, codegen-friendly, usable in any query.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def text_to_binary(col: Column) -> Column:
    """base64 or 0x-hex text -> binary (reference type_helpers.py:114-120)."""
    is_hex = col.rlike("^0[xX][0-9a-fA-F]+$")
    return F.when(is_hex, F.unhex(F.regexp_replace(col, "^0[xX]", ""))).otherwise(
        F.unbase64(col)
    )


def binary_to_text(col: Column) -> Column:
    """binary -> base64 text (reference type_helpers.py:91)."""
    return F.base64(col)


def text_to_bigint(col: Column) -> Column:
    """text -> bigint with 0x-hex support (reference type_helpers.py:123)."""
    is_hex = col.rlike("^0[xX][0-9a-fA-F]+$")
    return F.when(
        is_hex, F.conv(F.regexp_replace(col, "^0[xX]", ""), 16, 10).cast("bigint")
    ).otherwise(F.trim(col).try_cast("bigint"))


def str2bool(col: Column) -> Column:
    """Lenient text -> bool (reference dlt/common/utils.py str2bool)."""
    s = F.lower(F.trim(col))
    return (
        F.when(s.isin("true", "t", "1", "yes", "y"), F.lit(True))
        .when(s.isin("false", "f", "0", "no", "n"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def timestamp_from_epoch(col: Column, unit: str = "s") -> Column:
    """Epoch seconds/millis -> timestamp (reference type_helpers.py:224)."""
    if unit == "s":
        return F.timestamp_seconds(col)
    if unit == "ms":
        return F.timestamp_millis(col.cast("long"))
    if unit == "us":
        return F.timestamp_micros(col.cast("long"))
    raise ValueError("unit must be s|ms|us")


def epoch_from_timestamp(col: Column, unit: str = "s") -> Column:
    if unit == "s":
        return F.unix_timestamp(col)
    if unit == "ms":
        return F.unix_millis(col)
    if unit == "us":
        return F.unix_micros(col)
    raise ValueError("unit must be s|ms|us")


def parse_iso_timestamp(col: Column) -> Column:
    """ISO-ish text -> timestamp; NULL on failure (variant path)."""
    return F.to_timestamp(F.regexp_replace(col, "Z$", "+00:00"))


def normalize_timezone(col: Column, keep_tz: bool) -> Column:
    """Column-level tz flag (reference jsonl.py:260-262): tz-aware stays
    TimestampType (UTC-normalized); timezone=False -> TimestampNTZ."""
    return col if keep_tz else col.cast("timestamp_ntz")


def time_to_micros(col: Column) -> Column:
    """ISO time text -> microseconds since midnight (the engine's storage
    form for the dlt `time` type, which Spark lacks — SURVEY §1.2)."""
    t = F.to_timestamp(F.concat(F.lit("1970-01-01 "), col))
    return F.unix_micros(t)


def micros_to_time(col: Column) -> Column:
    """Microseconds since midnight -> ISO time text (HH:mm:ss.SSSSSS)."""
    return F.date_format(F.timestamp_micros(col), "HH:mm:ss.SSSSSS")


def wei_to_double(col: Column) -> Column:
    """wei (decimal 38,0) -> double (reference detections.py:80)."""
    return col.cast("double")


def bigint_to_binary_le(col: Column) -> Column:
    """Non-negative bigint -> minimal little-endian bytes (reference
    ``type_helpers.py:193``: ``v.to_bytes((v.bit_length()+7)//8,
    'little')`` — the wei/EVM-uint edge).  ``0`` -> 0 bytes, negatives ->
    NULL (``int.to_bytes`` raises there; NULL is the vectorized analog).
    Pure Column expr: hex -> even-pad -> byte-pair reverse -> unhex, all
    inside codegen."""
    h = F.hex(col)  # big-endian, no leading zeros
    h = F.when(F.length(h) % 2 == 1, F.concat(F.lit("0"), h)).otherwise(h)
    le_hex = F.array_join(F.reverse(F.regexp_extract_all(h, F.lit("(..)"), 1)), "")
    return (
        F.when(col < 0, F.lit(None).cast("binary"))
        .when(col == 0, F.unhex(F.lit("")))
        .otherwise(F.unhex(le_hex))
    )


def digest128(*cols: Column) -> Column:
    """128-bit deterministic content digest over columns — the engine's
    row/key hash (reference utils.py digest128; recipe re-specified as
    sha256/hex for cross-engine reproducibility, see
    normalize.relational.key_hash)."""
    from ..normalize.relational import key_hash

    return key_hash(*cols)


def json_field(col: Column, path: str) -> Column:
    """JSONPath field access on a JSON-text column (reference
    dlt/common/jsonpath.py cursor access)."""
    if not path.startswith("$"):
        path = "$." + path
    return F.get_json_object(col, path)
