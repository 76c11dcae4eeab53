"""Local stand-in for the driver's correctness gate: runs every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, column
names, pandas dtype families, and an order-insensitive canonical value
hash.

The comparison goes THROUGH pandas on both sides (``spark_df.toPandas()``
and ``duckdb_rel.df()``) because that is what the driver's canonicalizer
does: value rendering happens on the pandas frame, so an engine-level
exact match can still hash-mismatch at the driver when the two frames
land on different dtypes (round 5: list cells crashed the sort; round 6:
DuckDB HUGEINT sums rendered float64 "123.0" against Spark int64 "123").
Floats are rendered with full ``repr`` precision — ``1.0`` stays
``"1.0"`` and never collapses to ``"1"`` — so an int-vs-float dtype skew
is visible in the hash as well as in the dtype check.

Usage:  python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# pandas dtype.kind → comparison family. 'i'/'u' merge because the
# driver renders both as bare integers; everything else must match
# exactly (most importantly: int-family vs 'f' is a FAIL — that is the
# round-6 HUGEINT class).
_KIND_FAMILY = {
    "i": "int", "u": "int", "f": "float", "b": "bool",
    "M": "datetime", "m": "timedelta", "O": "object",
}


class ComplexCellError(TypeError):
    """Raised on list/dict/ndarray cells: the driver's pandas
    canonicalizer cannot hash complex-typed cells, so the local gate
    must reject them too (a query emitting ARRAY/MAP/STRUCT output
    passes a naive local check but errs at the driver — serialize to a
    deterministic string instead)."""


def canon_cell(v) -> str:
    """Render one pandas cell the way the driver's canonicalizer does.

    Key property: int-typed and float-typed cells render DIFFERENTLY
    (``123`` vs ``123.0``) so dtype skew shows up in the value hash.
    """
    import datetime as dt
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None:
        return "<NULL>"
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise ComplexCellError(
            f"complex-typed cell {type(v).__name__} — the driver gate "
            "rejects ARRAY/MAP/STRUCT outputs; serialize to a string"
        )
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        # the driver normalizes Decimal -> float before hashing (Spark
        # decimal sums arrive as object(Decimal), DuckDB as float64)
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        elif isinstance(v, dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        # DATE columns arrive as midnight datetime64 from duckdb.df()
        # but as date objects from Spark toPandas; the driver hashes the
        # two equal (every date-emitting TPC-H query is driver-green),
        # so midnight collapses to the date form here too
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _col_family(ser) -> str:
    """Dtype family for comparison.  Object columns resolve by VALUE:
    Spark dates/Decimals land as object dtype where DuckDB gives
    datetime64/float64 — the driver renders those pairs equal, so the
    families must unify here (the int-vs-float skew stays a mismatch)."""
    import datetime as dt
    import decimal

    fam = _KIND_FAMILY.get(ser.dtype.kind, ser.dtype.kind)
    if fam != "object":
        return fam
    for v in ser:
        if v is None or (isinstance(v, float)):
            continue
        if isinstance(v, dt.datetime):
            return "datetime"
        if isinstance(v, dt.date):
            return "datetime"
        if isinstance(v, decimal.Decimal):
            return "float"
        return "object"
    return "object"


def canon_frame(pdf):
    """(sorted column names, dtype families in that order, sorted canonical
    row lines) for a pandas frame — the driver-equivalent canonical form."""
    cols = sorted(pdf.columns)
    fams = [_col_family(pdf[c]) for c in cols]
    lines = sorted(
        "\x1f".join(canon_cell(row[c]) for c in cols)
        for row in pdf.to_dict("records")
    )
    return cols, fams, lines


def frame_hash(lines) -> str:
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if "/" not in a)

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    import os

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify_local")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # match bench.py: the default 1g driver cannot build the graph
        # family's gated broadcasts at sf0.1 (r9: triangle_census died
        # with notEnoughMemoryToBuildAndBroadcastTable under 1g)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        # a Spark-written table is a DIRECTORY of part files (the
        # scale_probe replicas); the driver's sf dirs are single files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/**/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle, rows-only check)")
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        try:
            scols, sfams, slines = canon_frame(spdf)
            ocols, ofams, olines = canon_frame(opdf)
        except ComplexCellError as e:
            failures.append(name)
            print(f"FAIL  {name}: {e}")
            continue
        ok_count = len(slines) == len(olines)
        ok_cols = scols == ocols
        ok_dtype = sfams == ofams
        ok_hash = frame_hash(slines) == frame_hash(olines)
        status = "ok" if (ok_count and ok_cols and ok_dtype and ok_hash) else "FAIL"
        dt_s = time.time() - t0
        col_note = "=" if ok_cols else f"{scols}!={ocols}"
        dtype_note = "=" if ok_dtype else f"{sfams}!={ofams}"
        hash_note = "=" if ok_hash else "MISMATCH"
        print(
            f"{status:5s} {name}: rows {len(slines)}/{len(olines)}"
            f" cols={col_note} dtypes={dtype_note} hash={hash_note} ({dt_s:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_hash and slines and olines:
                for a, b in zip(slines[:2000], olines[:2000]):
                    if a != b:
                        print(f"   spark : {a[:200]}")
                        print(f"   duckdb: {b[:200]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
