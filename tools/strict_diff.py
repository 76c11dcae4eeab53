"""Strict (no-canonicalization) diff between Spark queries and their
DuckDB oracles: compares raw Python values by ``repr`` including type
names, to surface any difference a stricter driver-side hasher would
see (Decimal scale, tz-awareness, int vs Decimal from HUGEINT, ...).

Usage:  python tools/strict_diff.py [--pandas] [sf_dir] [query_name ...]

``--pandas`` simulates a driver that fetches Spark via ``toPandas()``
and DuckDB via ``.df()`` then hashes ``str(cell)`` — the conversion
path where DuckDB DECIMAL/HUGEINT become float64 while Spark keeps
``decimal.Decimal`` / int64.
"""

from __future__ import annotations

import sys
import time


def cell(v) -> str:
    return f"{type(v).__name__}:{v!r}"


def pd_cell(v) -> str:
    return str(v)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--pandas"]
    pandas_mode = "--pandas" in sys.argv
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("strict_diff")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    for name in only or queries:
        fn = queries[name]
        if name not in oracles:
            print(f"---- {name}: no oracle")
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = list(sdf.columns)
        cur = con.sql(oracles[name])
        ocols = list(cur.columns)
        if pandas_mode:
            global cell
            cell = pd_cell
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False)]
            odf = cur.df()
            orows = [tuple(r) for r in odf.itertuples(index=False)]
        else:
            srows = [tuple(r) for r in sdf.collect()]
            orows = cur.fetchall()
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        s_lines = sorted("\x1f".join(cell(r[i]) for i in sorder) for r in srows)
        o_lines = sorted("\x1f".join(cell(r[i]) for i in oorder) for r in orows)
        ndiff = sum(1 for a, b in zip(s_lines, o_lines) if a != b) + abs(
            len(s_lines) - len(o_lines)
        )
        print(f"---- {name}: rows {len(srows)}/{len(orows)}, {ndiff} differing lines ({time.time()-t0:.1f}s)")
        shown = 0
        for a, b in zip(s_lines, o_lines):
            if a != b and shown < 3:
                print(f"  spark : {a[:400]}")
                print(f"  duckdb: {b[:400]}")
                shown += 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
