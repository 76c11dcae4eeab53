"""Partitioned table writes: partition hints -> hive layout -> pruning."""

import os

import pytest
from pyspark.sql import functions as F

import dlt_spark


def test_partition_hint_writes_hive_layout(spark, tmp_path):
    pipe = dlt_spark.pipeline("pt", str(tmp_path / "d"), "ds", spark)
    rows = [{"id": i, "day": f"2024-01-0{1 + i % 3}", "v": i} for i in range(30)]
    pipe.run(
        rows,
        table_name="events_p",
        columns={"day": {"name": "day", "partition": True}},
    )
    # hive layout on disk
    tdir = os.path.join(str(tmp_path / "d"), "ds", "events_p")
    vdirs = [d for d in os.listdir(tdir) if d.startswith("v_")]
    parts = os.listdir(os.path.join(tdir, vdirs[0]))
    assert any(p.startswith("day=") for p in parts), parts

    # read back includes partition column
    df = pipe.dataset()["events_p"].spark_df()
    assert df.count() == 30 and "day" in df.columns

    # partition pruning reaches the scan
    plan = (
        df.filter(F.col("day") == "2024-01-01")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:120]


def test_partitioned_append_preserves_spec(spark, tmp_path):
    pipe = dlt_spark.pipeline("pt2", str(tmp_path / "d"), "ds", spark)
    cols = {"day": {"name": "day", "partition": True}}
    pipe.run([{"id": 1, "day": "2024-01-01"}], table_name="t", columns=cols)
    pipe.run([{"id": 2, "day": "2024-01-02"}], table_name="t", columns=cols)
    df = pipe.dataset()["t"].spark_df()
    assert df.count() == 2
    # partition discovery type-infers the partition column (ISO strings -> date)
    assert {str(r["day"]) for r in df.collect()} == {"2024-01-01", "2024-01-02"}
