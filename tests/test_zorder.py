"""Z-order clustering: multi-dimensional manifest file skipping."""

import pytest
from pyspark.sql import functions as F

from dlt_spark.store.table_store import ParquetTableStore
from dlt_spark.store.zorder import column_ranges, zorder, zorder_key


@pytest.fixture()
def grid(spark):
    # 100x100 uniform grid: x and y are independent dimensions
    return spark.range(10000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") / 100).cast("long").cast("double").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_interleaves(spark):
    df = spark.createDataFrame([(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], ["x", "y"])
    k = zorder_key({"x": (0.0, 3.0), "y": (0.0, 3.0)}, bits=2)
    got = [r["z"] for r in df.select(k.alias("z")).collect()]
    # ranks: (0,0)->0, (3,0)->x=3 -> bits 0b0101, (0,3)->y=3 -> 0b1010, (3,3)->0b1111
    assert got == [0, 0b0101, 0b1010, 0b1111]


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    clustered = zorder(grid, ["x", "y"], num_files=16, bits=8)
    store.overwrite(clustered, "zgrid", sort_by=["x", "y"])

    total_x, after_x = store.skipped_files("zgrid", [("x", 10.0, 15.0)])
    total_y, after_y = store.skipped_files("zgrid", [("y", 10.0, 15.0)])
    assert total_x == total_y >= 8
    # a narrow slice on EITHER dimension must skip at least half the files
    assert after_x <= total_x / 2
    assert after_y <= total_y / 2

    # control: linear sort by x only -> y-slices cannot skip
    lin = grid.repartitionByRange(16, "x").sortWithinPartitions("x")
    store.overwrite(lin, "lingrid", sort_by=["x", "y"])
    _, lin_after_x = store.skipped_files("lingrid", [("x", 10.0, 15.0)])
    _, lin_after_y = store.skipped_files("lingrid", [("y", 10.0, 15.0)])
    assert lin_after_x <= total_x / 2          # leading column still prunes
    assert lin_after_y >= total_y * 0.9        # trailing column: ~no pruning


def test_zorder_preserves_rows(spark, grid, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    store.overwrite(zorder(grid, ["x", "y"], num_files=8, bits=8), "t", sort_by=["x", "y"])
    out = store.read("t")
    assert out.count() == 10000
    assert out.agg(F.sum("payload")).collect()[0][0] == sum(range(10000))


def test_zorder_read_with_where_matches_full_filter(spark, grid, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    store.overwrite(zorder(grid, ["x", "y"], num_files=16, bits=8), "t", sort_by=["x", "y"])
    pruned = store.read("t", where=[("y", 20.0, 30.0)]).filter(
        (F.col("y") >= 20.0) & (F.col("y") <= 30.0)
    )
    full = store.read("t").filter((F.col("y") >= 20.0) & (F.col("y") <= 30.0))
    assert pruned.count() == full.count()


def test_column_ranges(spark, grid):
    r = column_ranges(grid, ["x", "y"])
    assert r["x"] == (0.0, 99.0)
    assert r["y"] == (0.0, 99.0)


def test_zorder_hint_with_four_columns_loads(spark, tmp_path):
    """A 4+ column zorder hint is valid (Delta accepts any ZORDER
    arity); the load path must degrade per-column bit resolution so
    bits*cols fits a BIGINT instead of crashing the write."""
    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    rows = [
        {"a": i % 7, "b": i % 11, "c": i % 13, "d": i % 17}
        for i in range(500)
    ]
    res = DltResource(rows, name="z4")
    res.apply_hints(columns={
        c: {"name": c, "zorder": True} for c in ("a", "b", "c", "d")
    })
    pipe = dlt_spark.pipeline(
        "z4pipe", str(tmp_path / "z4"), "ds", spark
    )
    pipe.run(res)
    assert len(pipe.dataset()["z4"].fetchall()) == 500
