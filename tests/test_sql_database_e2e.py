"""End-to-end JDBC round-trip for the sql_database source and the
insert-values write path, against embedded Apache Derby (the one JDBC
database whose jars ship on Spark's classpath).

Covers what the option-construction unit tests in test_sources.py cannot:
the actual read call, source-side WHERE execution, parallel range
partitioning, and Spark->JDBC filter pushdown (reference sql_database
source, ``dlt/sources/sql_database/__init__.py:38-187``)."""

import datetime as dt
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_spark.dataset.relation import Relation
from dlt_spark.incremental import Incremental
from dlt_spark.sources.sql_database import sql_database, sql_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    """Write two tables through the insert-values path (Relation.write_jdbc
    — Spark's batched JDBC writer) and return (url, row count)."""
    df = spark.range(0, 200).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("val"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3600).alias("ts"),
    )
    rel = Relation(df)
    # explicit VARCHAR: Derby maps StringType to CLOB by default, which
    # is not comparable in WHERE clauses
    rel.write_jdbc(
        derby_url, "events_jdbc", mode="overwrite",
        driver=DERBY_DRIVER, createTableColumnTypes="name VARCHAR(64)",
    )
    Relation(df.limit(10)).write_jdbc(
        derby_url, "events_small", mode="overwrite",
        driver=DERBY_DRIVER, createTableColumnTypes="name VARCHAR(64)",
    )
    return derby_url, 200


def test_full_table_roundtrip(spark, seeded):
    url, n = seeded
    back = sql_table(spark, url, "events_jdbc", driver=DERBY_DRIVER)
    assert back.count() == n
    # values survive the round-trip, not just counts
    row = back.filter(F.col("id") == 7).select("name", "val").collect()[0]
    assert row["name"] == "name_7" and row["val"] == pytest.approx(10.5)


def test_incremental_where_executes_in_source(spark, seeded):
    url, n = seeded
    inc = Incremental(cursor_path="id", initial_value=150, range_start="closed")
    df = sql_table(
        spark, url, "events_jdbc", incremental=inc,
        driver=DERBY_DRIVER, identifier_quote='"',
    )
    assert df.count() == 50  # 150..199, closed start


def test_incremental_timestamp_cursor(spark, seeded):
    url, _ = seeded
    start = dt.datetime(2023, 11, 14, 22, 13, 20) + dt.timedelta(hours=100)
    inc = Incremental(cursor_path="ts", initial_value=start, range_start="open")
    df = sql_table(
        spark, url, "events_jdbc", incremental=inc,
        driver=DERBY_DRIVER, identifier_quote='"',
    )
    assert df.count() == 99  # ids 101..199 (open start excludes id=100)


def test_partitioned_parallel_scan(spark, seeded):
    url, n = seeded
    df = sql_table(
        spark, url, "events_jdbc",
        partition_column="id", lower_bound=0, upper_bound=200, num_partitions=4,
        driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == n


def test_filter_pushdown_reaches_jdbc_scan(spark, seeded):
    url, _ = seeded
    df = sql_table(spark, url, "events_jdbc", driver=DERBY_DRIVER)
    flt = df.filter(F.col("id") < 10).select("id", "name")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "JDBC scan shows no PushedFilters"
    assert "LessThan(id,10)" in m.group(1).replace(" ", "")
    assert flt.count() == 10


def test_sql_database_multi_table(spark, seeded):
    url, n = seeded
    tables = sql_database(spark, url, ["events_jdbc", "events_small"], driver=DERBY_DRIVER)
    assert tables["events_jdbc"].count() == n
    assert tables["events_small"].count() == 10


def test_incremental_bounds_min_max(spark, seeded):
    url, _ = seeded
    inc = Incremental(cursor_path="id", initial_value=150, range_start="closed")
    df = sql_table(
        spark, url, "events_jdbc", incremental=inc,
        driver=DERBY_DRIVER, identifier_quote='"',
    )
    got = df.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()[0]
    assert (got["lo"], got["hi"]) == (150, 199)


# ------------------------------------------------- adapter callbacks
# (reference sql_database/__init__.py:48-52)


def test_table_adapter_callback_prunes_columns(spark, seeded):
    """table_adapter_callback edits the reflected column list; the
    generated SELECT fetches only the survivors (source-side pruning)."""
    url, n = seeded
    seen = {}

    def keep_id_name(rt):
        seen["columns"] = list(rt.columns)
        rt.fields = [f for f in rt.fields if f.name.lower() in ("id", "name")]
        return rt

    df = sql_table(
        spark, url, "events_jdbc", driver=DERBY_DRIVER,
        identifier_quote='"',
        table_adapter_callback=keep_id_name,
    )
    assert sorted(c.lower() for c in df.columns) == ["id", "name"]
    assert df.count() == n
    # the callback saw the full reflected schema
    assert sorted(c.lower() for c in seen["columns"]) == ["id", "name", "ts", "val"]


def test_type_adapter_callback_overrides_scan_type(spark, seeded):
    """type_adapter_callback's override lands in the JDBC customSchema
    option — the column arrives from the scan already in the new type."""
    from pyspark.sql.types import DecimalType, DoubleType

    url, _ = seeded

    def widen_val(field):
        if isinstance(field.dataType, DoubleType) and field.name.lower() == "val":
            return DecimalType(20, 4)
        return None

    df = sql_table(
        spark, url, "events_jdbc", driver=DERBY_DRIVER,
        type_adapter_callback=widen_val,
    )
    types = {c.lower(): t for c, t in df.dtypes}
    assert types["val"] == "decimal(20,4)"
    row = df.filter(F.col("id") == 7).select("val").collect()[0]
    assert float(row["val"]) == pytest.approx(10.5)


def test_query_adapter_callback_rewrites_pushdown_sql(spark, seeded):
    """query_adapter_callback receives the generated inner SELECT (with
    the incremental WHERE already rendered) and returns the SQL to run."""
    url, _ = seeded
    captured = {}

    def sample_even(sql, table, inc):
        captured["sql"] = sql
        captured["table"] = table
        captured["inc"] = inc
        # Derby: MOD() is a function, not an operator
        return sql + (" AND" if " WHERE " in sql else " WHERE") + ' MOD("id", 2) = 0'

    inc = Incremental(cursor_path="id", initial_value=100, range_start="closed")
    df = sql_table(
        spark, url, "events_jdbc", incremental=inc,
        driver=DERBY_DRIVER, identifier_quote='"',
        query_adapter_callback=sample_even,
    )
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids == list(range(100, 200, 2))
    assert captured["table"] == "events_jdbc"
    assert captured["inc"] is inc
    assert '"id" >= 100' in captured["sql"]


def test_all_three_adapters_compose(spark, seeded):
    """Pruned columns + type override + query rewrite in one scan."""
    from pyspark.sql.types import DecimalType, DoubleType

    url, _ = seeded
    df = sql_table(
        spark, url, "events_jdbc", driver=DERBY_DRIVER,
        identifier_quote='"',
        table_adapter_callback=lambda rt: setattr(
            rt, "fields", [f for f in rt.fields if f.name.lower() != "ts"]
        ) or rt,
        type_adapter_callback=lambda f: (
            DecimalType(20, 4) if isinstance(f.dataType, DoubleType) else None
        ),
        query_adapter_callback=lambda sql, t, i: sql + ' WHERE "id" < 10',
    )
    assert sorted(c.lower() for c in df.columns) == ["id", "name", "val"]
    assert df.count() == 10
    assert dict((c.lower(), t) for c, t in df.dtypes)["val"] == "decimal(20,4)"


def test_table_adapter_cannot_remove_all_columns(spark, seeded):
    url, _ = seeded
    with pytest.raises(ValueError, match="every column"):
        sql_table(
            spark, url, "events_jdbc", driver=DERBY_DRIVER,
            table_adapter_callback=lambda rt: setattr(rt, "fields", []) or rt,
        )
