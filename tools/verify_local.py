"""Local stand-in for the driver's correctness gate: runs every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, column
names, and an order-insensitive canonical value hash.

Usage:  python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


class ComplexCellError(TypeError):
    """Raised on list/dict/Row cells: the driver's pandas canonicalizer
    cannot hash complex-typed cells, so the local gate must reject them
    too (a query emitting ARRAY/MAP/STRUCT output passes locally but
    errs at the driver — serialize to a deterministic string instead)."""


def canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.10g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple, dict, set)):
        raise ComplexCellError(
            f"complex-typed cell {type(v).__name__} — the driver gate "
            "rejects ARRAY/MAP/STRUCT outputs; serialize to a string"
        )
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
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

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify_local")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
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
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle, rows-only check)")
            continue
        try:
            cur = con.sql(oracles[name])
            ocols = list(cur.columns)
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        try:
            sh = frame_hash(scols, srows)
            oh = frame_hash(ocols, orows)
        except ComplexCellError as e:
            failures.append(name)
            print(f"FAIL  {name}: {e}")
            continue
        ok_hash = sh == oh
        status = "ok" if (ok_count and ok_cols and ok_hash) else "FAIL"
        dt_s = time.time() - t0
        col_note = "=" if ok_cols else f"{sorted(scols)}!={sorted(ocols)}"
        hash_note = "=" if ok_hash else "MISMATCH"
        print(
            f"{status:5s} {name}: rows {len(srows)}/{len(orows)}"
            f" cols={col_note} hash={hash_note} ({dt_s:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_hash and srows and orows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_lines = sorted("\x1f".join(canon_cell(r[i]) for i in order) for r in srows)
                o_lines = sorted("\x1f".join(canon_cell(r[i]) for i in oorder) for r in orows)
                for a, b in zip(s_lines[:500], o_lines[:500]):
                    if a != b:
                        print(f"   spark : {a[:200]}")
                        print(f"   duckdb: {b[:200]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
