"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides onto the join key.  Spark's bucketing writes a table pre-hashed
into ``num_buckets`` files per partition (catalog-recorded), so a join
or aggregation on the bucket key reads both sides already co-located:
the planner drops the ``Exchange`` entirely (and with ``sortBy`` the
``Sort`` too).  This is the storage-side dial the engine offers next to
AQE (runtime) and ``salted_join`` (skew): pay one shuffle at WRITE time,
amortized over every subsequent join on that key.

Spark requires bucketing metadata to live in a catalog table (path-only
parquet reads cannot recover it), so these helpers write EXTERNAL
catalog tables: data at your path, bucketing spec in the session
catalog.  Re-attach in a new session with ``register_bucketed``.

Reference behavior note: dlt destinations expose per-table ``cluster``
hints (e.g. BigQuery clustering, `dlt/destinations/impl/bigquery/`);
bucketing is the Spark-native equivalent of that physical co-location
hint.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str] | str,
    num_buckets: int = 32,
    path: Optional[str] = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed external table ``name``.

    ``keys`` are the bucket (and sort) columns — use the join/agg key.
    ``num_buckets`` should match between tables you intend to co-join
    (Spark 4 can coalesce mismatched bucket counts when one is a
    multiple of the other, but equal is the fast path).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    keys: Sequence[str] | str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Re-attach an existing bucketed dataset in a fresh session's
    catalog (bucket metadata is catalog state, not file state)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = ", ".join(keys)
    sorted_clause = f"SORTED BY ({cols})" if sort else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({cols}) {sorted_clause} INTO {num_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (plain catalog read — the bucket spec rides
    along and removes Exchanges under joins/aggs on the bucket key)."""
    return spark.table(name)
