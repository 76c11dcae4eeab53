"""SQL database source via Spark's JDBC reader.

Re-expression of the reference sql_database source
(``dlt/sources/sql_database/__init__.py:38-187``, query builder
``helpers.py:157-213``).  The reference reflects tables with SQLAlchemy
and streams chunked SELECTs through Python; on Spark the same contract is
``spark.read.jdbc`` with

- the incremental cursor rendered into **pushed predicates** (the
  reference's incremental WHERE, ``helpers.py:157-213``) so the source DB
  does the filtering,
- ``partitionColumn/lowerBound/upperBound/numPartitions`` for parallel
  range scans (the scale analog of the reference's ``chunk_size=50000``
  fetch loop — N executors each own a key range),
- table reflection via the JDBC catalog (``JDBC_METADATA_QUERY``).

Exercised end-to-end against embedded Apache Derby (the JDBC database
that ships on Spark's classpath) in ``tests/test_sql_database_e2e.py`` —
real writes via the insert-values path, cursor-windowed reads, parallel
range scans, and filter pushdown.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..incremental import Incremental


@dataclass
class ReflectedTable:
    """What a ``table_adapter_callback`` receives: the table name plus
    the reflected column list (Spark ``StructField``s from a zero-row
    JDBC probe).  Mutate ``fields`` (or return a new instance) to prune
    or reorder the columns the generated SELECT will fetch — the Spark
    analog of the reference callback editing the reflected SQLAlchemy
    ``Table.columns`` (``dlt/sources/sql_database/__init__.py:48``,
    applied ``schema_types.py`` / ``helpers.py:446``)."""

    name: str
    fields: List[Any]  # list[StructField], mutable

    @property
    def columns(self) -> List[str]:
        return [f.name for f in self.fields]


def _render_literal(v: Any) -> str:
    import datetime as dt

    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(v, dt.datetime):
        # JDBC escape syntax: translated by every compliant driver into
        # the database's own literal form (Derby rejects ANSI TIMESTAMP
        # '...' literals; Postgres/MySQL/Oracle drivers all accept {ts})
        return f"{{ts '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'}}"
    if isinstance(v, dt.date):
        return f"{{d '{v.isoformat()}'}}"
    return str(v)


def build_incremental_where(
    inc: Incremental, identifier_quote: Optional[str] = None
) -> Optional[str]:
    """Render the cursor window as SQL (reference ``incremental/sql.py``):
    pushed to the source database via the JDBC ``predicates`` option.

    ``identifier_quote``: quote the cursor column (``'"'`` for ANSI
    databases — Derby/Postgres/Oracle fold unquoted identifiers, so a
    table created with quoted lowercase columns needs quoted references;
    ``'`'`` for MySQL).  Default leaves the identifier as written."""
    conds: List[str] = []
    start = inc._start_bound()
    asc = inc.last_value_func == "max"
    closed_start = inc.range_start == "closed" or inc.lag is not None
    c = inc.cursor_path
    if identifier_quote and not c.startswith(identifier_quote):
        c = f"{identifier_quote}{c}{identifier_quote}"
    if start is not None:
        op = (">=" if closed_start else ">") if asc else ("<=" if closed_start else "<")
        conds.append(f"{c} {op} {_render_literal(start)}")
    if inc.end_value is not None:
        op = ("<=" if inc.range_end == "closed" else "<") if asc else (
            ">=" if inc.range_end == "closed" else ">"
        )
        conds.append(f"{c} {op} {_render_literal(inc.end_value)}")
    if inc.on_cursor_value_missing == "exclude":
        conds.append(f"{c} IS NOT NULL")
    elif inc.on_cursor_value_missing == "include" and conds:
        return f"({' AND '.join(conds)}) OR {c} IS NULL"
    return " AND ".join(conds) if conds else None


def sql_table_options(
    table: str,
    incremental: Optional[Incremental] = None,
    partition_column: Optional[str] = None,
    lower_bound: Optional[Any] = None,
    upper_bound: Optional[Any] = None,
    num_partitions: int = 8,
    identifier_quote: Optional[str] = None,
    select_columns: Optional[Sequence[str]] = None,
    query_adapter_callback: Optional[Callable[..., str]] = None,
) -> Dict[str, str]:
    """Build the option dict for ``spark.read.format('jdbc')``: dbtable is
    a pushdown subquery embedding the incremental WHERE (the JDBC source
    additionally pushes later ``.filter``s).

    ``select_columns`` narrows the SELECT list (source-side column
    pruning, fed by ``table_adapter_callback``).
    ``query_adapter_callback(sql, table, incremental)`` receives the
    generated inner SELECT text and returns the SQL to run instead — the
    Spark analog of the reference rewriting the SQLAlchemy ``Select``
    (``dlt/sources/sql_database/__init__.py:51``, applied
    ``helpers.py:214-222``)."""
    q = identifier_quote or ""
    if select_columns:
        cols = ", ".join(f"{q}{c}{q}" if q else c for c in select_columns)
    else:
        cols = "*"
    where = build_incremental_where(incremental, identifier_quote) if incremental else None
    select_sql = f"SELECT {cols} FROM {table}" + (f" WHERE {where}" if where else "")
    if query_adapter_callback is not None:
        select_sql = query_adapter_callback(select_sql, table, incremental)
    dbtable = f"({select_sql}) AS {table}_src"
    opts: Dict[str, str] = {"dbtable": dbtable}
    if partition_column:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC scans need lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def reflect_table(
    spark: SparkSession,
    connection_url: str,
    table: str,
    driver: Optional[str] = None,
    **jdbc_options: str,
) -> ReflectedTable:
    """Reflect a table's columns via a zero-row JDBC probe (``WHERE
    1=0`` — metadata-only on every compliant driver); the Spark analog of
    the reference's SQLAlchemy reflection (``schema_types.py``)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", connection_url)
        .option("dbtable", f"(SELECT * FROM {table} WHERE 1=0) AS {table}_probe")
        .options(**jdbc_options)
    )
    if driver:
        reader = reader.option("driver", driver)
    return ReflectedTable(table, list(reader.load().schema.fields))


def sql_table(
    spark: SparkSession,
    connection_url: Optional[str] = None,
    table: str = "",
    incremental: Optional[Incremental] = None,
    partition_column: Optional[str] = None,
    lower_bound: Optional[Any] = None,
    upper_bound: Optional[Any] = None,
    num_partitions: int = 8,
    driver: Optional[str] = None,
    identifier_quote: Optional[str] = None,
    table_adapter_callback: Optional[Callable[[ReflectedTable], Optional[ReflectedTable]]] = None,
    type_adapter_callback: Optional[Callable[[Any], Optional[Any]]] = None,
    query_adapter_callback: Optional[Callable[..., str]] = None,
    **jdbc_options: str,
) -> DataFrame:
    """One table as a (possibly parallel, cursor-windowed) JDBC scan —
    the reference's ``sql_table`` resource (``__init__.py:187``).

    Adapter callbacks (reference ``sql_database/__init__.py:48-52``),
    re-expressed for the Spark JDBC reader:

    - ``table_adapter_callback(ReflectedTable) -> ReflectedTable | None``
      — prune/reorder the reflected columns; the generated SELECT fetches
      only the surviving columns (source-side column pruning).
    - ``type_adapter_callback(StructField) -> DataType | None`` — override
      the Spark type a reflected column maps to; collected into the JDBC
      reader's ``customSchema`` option so the override applies AT SCAN
      TIME (no post-read cast), exactly where the reference overrides the
      reflected SQLAlchemy type.
    - ``query_adapter_callback(sql, table, incremental) -> sql`` — rewrite
      the generated pushdown SELECT (custom hints, joins, sampling).

    The first two need a reflection probe (one zero-row JDBC round
    trip); without callbacks no probe is made.

    ``connection_url`` omitted resolves from secrets:
    ``sources.sql_database.credentials`` (or ``connection_url``) via env
    (``SOURCES__SQL_DATABASE__CREDENTIALS``) or ``.dlt/secrets.toml`` —
    the reference's zero-inline-credentials workflow."""
    if connection_url is None:
        from ..config import resolve_credentials

        connection_url = resolve_credentials(
            None, sections=("sources", "sql_database"),
            keys=("credentials", "connection_url"),
        )
        if connection_url is None:
            raise ValueError(
                "no connection_url given and sources.sql_database.credentials"
                " not found in secrets/env"
            )
    if not table:
        raise ValueError("table name is required")
    select_columns: Optional[List[str]] = None
    custom_schema: Optional[str] = None
    if table_adapter_callback is not None or type_adapter_callback is not None:
        reflected = reflect_table(
            spark, connection_url, table, driver=driver, **jdbc_options
        )
        if table_adapter_callback is not None:
            out = table_adapter_callback(reflected)
            if out is not None:
                reflected = out
            if not reflected.fields:
                raise ValueError(
                    f"table_adapter_callback removed every column of {table!r}"
                )
            select_columns = reflected.columns
        if type_adapter_callback is not None:
            overrides = []
            for f in reflected.fields:
                new_type = type_adapter_callback(f)
                if new_type is not None:
                    # backquote the name: a reflected column containing
                    # spaces/reserved characters must stay parseable in
                    # the customSchema DDL, matching the quoting already
                    # applied to select_columns
                    overrides.append(f"`{f.name}` {new_type.simpleString()}")
            if overrides:
                custom_schema = ", ".join(overrides)
    reader = (
        spark.read.format("jdbc")
        .option("url", connection_url)
        .options(**sql_table_options(
            table, incremental, partition_column, lower_bound, upper_bound,
            num_partitions, identifier_quote,
            select_columns=select_columns,
            query_adapter_callback=query_adapter_callback,
        ))
        .options(**jdbc_options)
    )
    if custom_schema:
        reader = reader.option("customSchema", custom_schema)
    if driver:
        reader = reader.option("driver", driver)
    return reader.load()


def sql_database(
    spark: SparkSession,
    connection_url: str,
    tables: Sequence[str],
    **kwargs: Any,
) -> Dict[str, DataFrame]:
    """Reflect-and-read multiple tables (reference ``sql_database()``,
    ``__init__.py:38``); returns {table: DataFrame}."""
    return {t: sql_table(spark, connection_url, t, **kwargs) for t in tables}
