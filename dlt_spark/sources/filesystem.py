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
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_storage_options(
    spark: SparkSession, bucket_url: str, credentials: Optional[dict]
) -> None:
    """Map a dlt-style credentials dict onto the Hadoop configuration the
    Spark readers consult for that bucket's scheme — the cloud-auth
    surface of the reference filesystem source
    (``dlt/sources/filesystem/__init__.py:96`` bucket credentials;
    ``common/configuration/specs/aws_credentials.py:24-28`` /
    ``azure_credentials.py:21,49-50`` / ``gcp_credentials.py`` field
    names are accepted verbatim).

    S3 keys are scoped PER BUCKET (``fs.s3a.bucket.<name>.*``) so two
    buckets with different credentials coexist in one session — the
    per-bucket configs the reference keeps in its fsspec layer.  Keys
    not recognized as dlt credential fields pass through untouched when
    they already look like Hadoop keys (``fs.`` / ``google.`` prefix),
    so raw ``storage_options`` escape-hatch configs keep working.

    The actual cloud connectors (hadoop-aws, gcs-connector, hadoop-azure)
    ship as jars with a real cluster distribution — this container has
    none, so tests assert the conf lands on the session, not a live
    read.  README documents the jar requirements.
    """
    if not credentials:
        return
    u = urlparse(bucket_url)
    scheme, bucket = u.scheme.lower(), u.netloc
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _set(key: str, value) -> None:
        if value is not None:
            conf.set(key, str(value))

    if scheme in ("s3", "s3a", "s3n"):
        base = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
        _set(f"{base}.access.key", credentials.get("aws_access_key_id"))
        _set(f"{base}.secret.key", credentials.get("aws_secret_access_key"))
        _set(f"{base}.session.token", credentials.get("aws_session_token"))
        _set(f"{base}.endpoint", credentials.get("endpoint_url"))
        _set(f"{base}.endpoint.region", credentials.get("region_name"))
        if credentials.get("aws_session_token"):
            _set(
                f"{base}.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
            )
    elif scheme in ("gs", "gcs"):
        _set("fs.gs.project.id", credentials.get("project_id"))
        if credentials.get("private_key"):
            _set("fs.gs.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
            _set(
                "fs.gs.auth.service.account.private.key",
                credentials.get("private_key"),
            )
            _set(
                "fs.gs.auth.service.account.email",
                credentials.get("client_email"),
            )
        elif credentials.get("keyfile"):
            _set("fs.gs.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
            _set(
                "google.cloud.auth.service.account.json.keyfile",
                credentials.get("keyfile"),
            )
    elif scheme in ("abfs", "abfss", "az", "azure"):
        account = credentials.get("azure_storage_account_name")
        host = f"{account}.dfs.core.windows.net"
        if credentials.get("azure_storage_account_key"):
            _set(f"fs.azure.account.auth.type.{host}", "SharedKey")
            _set(
                f"fs.azure.account.key.{host}",
                credentials.get("azure_storage_account_key"),
            )
        elif credentials.get("azure_storage_sas_token"):
            _set(f"fs.azure.account.auth.type.{host}", "SAS")
            _set(
                f"fs.azure.sas.fixed.token.{host}",
                credentials.get("azure_storage_sas_token"),
            )
    # raw Hadoop keys pass through for any scheme (escape hatch)
    for k, v in credentials.items():
        if k.startswith(("fs.", "google.")):
            _set(k, v)


def filesystem(
    spark: SparkSession,
    bucket_url: str,
    file_glob: str = "**",
    credentials: Optional[dict] = None,
) -> DataFrame:
    """List files matching the glob as FileItem rows:
    (file_url, file_name, mime_type, size_in_bytes, modification_date).
    Mirrors the reference FileItem schema (``filesystem/__init__.py:96``).
    Uses Spark's binaryFile source for distributed listing + metadata.
    ``credentials`` (optional) is applied to the session's Hadoop conf
    via :func:`apply_storage_options` before listing."""
    apply_storage_options(spark, bucket_url, credentials)
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


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan (beyond-reference format — native in Spark, same
    provenance column convention as the other readers)."""
    return (
        spark.read.options(**options).orc(path)
        .withColumn("_file_url", F.input_file_name())
    )


def read_xml(spark: SparkSession, path: str, row_tag: str = "row", **options: str) -> DataFrame:
    """XML scan (Spark 4 ships the built-in xml source; beyond-reference
    format).  ``row_tag`` names the repeating element."""
    return (
        spark.read.format("xml").option("rowTag", row_tag)
        .options(**options).load(path)
        .withColumn("_file_url", F.input_file_name())
    )


def read_avro(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Avro scan — requires the external spark-avro module on the
    classpath (Spark bundles the format but not the jar); raises a
    clear error otherwise."""
    try:
        return (
            spark.read.format("avro").options(**options).load(path)
            .withColumn("_file_url", F.input_file_name())
        )
    except Exception as ex:
        if "Failed to find data source: avro" in str(ex):
            raise ImportError(
                "spark-avro is not on the classpath; add the "
                "org.apache.spark:spark-avro package to read avro"
            ) from ex
        raise


def read_location(spark: SparkSession, path: str, fmt: Optional[str] = None, **options: str) -> DataFrame:
    """Dispatch by extension when ``fmt`` not given."""
    fmt = fmt or path.rsplit(".", 1)[-1].lower().replace("jsonl", "json")
    if fmt == "csv":
        return read_csv(spark, path, **options)
    if fmt in ("json", "ndjson"):
        return read_jsonl(spark, path, **options)
    if fmt == "parquet":
        return read_parquet(spark, path, **options)
    if fmt == "orc":
        return read_orc(spark, path, **options)
    if fmt == "xml":
        return read_xml(spark, path, **options)
    if fmt == "avro":
        return read_avro(spark, path, **options)
    raise ValueError(f"unsupported file format {fmt!r}")
