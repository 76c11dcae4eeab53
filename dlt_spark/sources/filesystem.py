"""Filesystem source: glob listing + native Spark readers.

Re-expression of the reference filesystem source
(``dlt/sources/filesystem/__init__.py:96`` FileItem listing,
``readers.py:15-101`` read_csv/read_jsonl/read_parquet transformers).
Where the reference lists files driver-side with fsspec and parses chunks
in Python, Spark's distributed readers take both roles:

- :func:`filesystem` yields FileItem *metadata* rows (one per matched
  file) — a real DataFrame, built JVM-side from the Hadoop glob; at 100 TB
  the listing itself can be large, so it is a DataFrame, not a list;
- :func:`read_csv` / :func:`read_jsonl` / :func:`read_parquet` map
  straight onto ``spark.read.*`` with ``input_file_name()`` attached —
  partitioned, pushdown-capable scans (the reference's chunked Python
  parse loop is unnecessary).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def filesystem(
    spark: SparkSession, bucket_url: str, file_glob: str = "**"
) -> DataFrame:
    """List files matching the glob as FileItem rows:
    (file_url, file_name, mime_type, size_in_bytes, modification_date).
    Mirrors the reference FileItem schema (``filesystem/__init__.py:96``).
    Uses Spark's binaryFile source for distributed listing + metadata."""
    path = os.path.join(bucket_url, file_glob)
    listed = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
        .select(
            F.col("path").alias("file_url"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").alias("size_in_bytes"),
            F.col("modificationTime").alias("modification_date"),
        )
    )
    return listed


def read_csv(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """CSV scan with header+schema inference defaults and provenance
    column (reference ``readers.py:15 read_csv``)."""
    opts = {"header": "true", "inferSchema": "true", **options}
    return (
        spark.read.options(**opts).csv(path)
        .withColumn("_file_url", F.input_file_name())
    )


def read_csv_duckdb(
    spark: SparkSession,
    path: str,
    chunk_size: int = 5000,
    **duckdb_kwargs,
) -> DataFrame:
    """DuckDB-engine CSV import (reference ``readers.py:101
    _read_csv_duckdb``): DuckDB's sniffer handles ragged quoting, mixed
    date formats and dialect quirks that Spark's CSV parser rejects, and
    its type casts replace inferSchema.  The scan streams Arrow record
    batches of ``chunk_size`` rows into one Spark DataFrame.

    Driver-side by design, exactly like the reference (a Python loop over
    the file) — use :func:`read_csv` (distributed Spark scan) for large
    data; this is the escape hatch for messy small/medium files.
    ``duckdb_kwargs`` pass through to ``duckdb.read_csv`` (e.g.
    ``delim``, ``dateformat``, ``types``)."""
    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    try:
        rel = con.read_csv(path, **duckdb_kwargs)
        reader = rel.fetch_arrow_reader(batch_size=chunk_size)
        batches = list(reader)
        tbl = (
            pa.Table.from_batches(batches)
            if batches
            else rel.arrow().slice(0, 0)
        )
    finally:
        con.close()
    return spark.createDataFrame(tbl).withColumn("_file_url", F.lit(path))


def read_jsonl(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """JSON-lines scan (reference ``readers.py:51 read_jsonl``)."""
    return (
        spark.read.options(**options).json(path)
        .withColumn("_file_url", F.input_file_name())
    )


def read_parquet(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Parquet scan (reference ``readers.py:74 read_parquet``)."""
    return (
        spark.read.options(**options).parquet(path)
        .withColumn("_file_url", F.input_file_name())
    )


def read_location(spark: SparkSession, path: str, fmt: Optional[str] = None, **options: str) -> DataFrame:
    """Dispatch by extension when ``fmt`` not given."""
    fmt = fmt or path.rsplit(".", 1)[-1].lower().replace("jsonl", "json")
    if fmt == "csv":
        return read_csv(spark, path, **options)
    if fmt in ("json", "ndjson"):
        return read_jsonl(spark, path, **options)
    if fmt == "parquet":
        return read_parquet(spark, path, **options)
    raise ValueError(f"unsupported file format {fmt!r}")
