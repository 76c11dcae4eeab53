"""Incremental unit tests beyond the pipeline E2E — F5 fixture coverage
(reference tests/extract/test_incremental.py, test_lag.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dlt_spark.incremental import Incremental, incremental


@pytest.fixture(scope="module")
def clicks(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (2, "2024-01-02 00:00:00", 2.0),
        (3, "2024-01-02 00:00:00", 3.0),  # boundary twin
        (4, "2024-01-03 00:00:00", 4.0),
        (5, None, 5.0),
    ]
    return spark.createDataFrame(
        rows, "id long, created_at string, value double"
    ).withColumn("created_at", F.to_timestamp("created_at"))


def test_open_vs_closed_range(clicks):
    base = dict(cursor_path="created_at", initial_value=dt.datetime(2024, 1, 2))
    open_inc = Incremental(**base, range_start="open")
    assert open_inc.apply(clicks).count() == 1  # only id=4
    closed_inc = Incremental(**base, range_start="closed")
    assert closed_inc.apply(clicks).count() == 3  # 2,3,4


def test_min_cursor(clicks):
    # default range_start='closed' (reference default): boundary included
    inc = Incremental("created_at", initial_value=dt.datetime(2024, 1, 2), last_value_func="min")
    assert inc.apply(clicks).count() == 3  # ids 1,2,3 (<= boundary)
    open_inc = Incremental(
        "created_at", initial_value=dt.datetime(2024, 1, 2),
        last_value_func="min", range_start="open",
    )
    assert open_inc.apply(clicks).count() == 1  # id=1 (strictly before)


def test_null_policy_include_exclude(clicks):
    inc = Incremental("created_at", initial_value=dt.datetime(2024, 1, 2), on_cursor_value_missing="include")
    ids = {r["id"] for r in inc.apply(clicks).collect()}
    assert 5 in ids and 4 in ids
    exc = Incremental("created_at", on_cursor_value_missing="exclude")
    assert 5 not in {r["id"] for r in exc.apply(clicks).collect()}


def test_null_policy_raise(clicks):
    inc = Incremental("created_at", on_cursor_value_missing="raise")
    with pytest.raises(ValueError, match="NULL"):
        inc.update_state(clicks)


def test_boundary_dedup_roundtrip(clicks):
    inc = Incremental("created_at", primary_key=["id"], range_start="closed")
    loaded = clicks.filter(F.col("created_at") <= "2024-01-02")
    inc.update_state(loaded)
    assert inc.last_value == dt.datetime(2024, 1, 2)
    assert len(inc.boundary_hashes) == 2  # ids 2,3 at boundary
    # next run re-reads from the boundary (closed) but drops seen rows
    out = inc.apply(clicks.filter(F.col("created_at").isNotNull()))
    assert {r["id"] for r in out.collect()} == {4}


def test_boundary_dedup_row_hash_no_pk(clicks):
    """Default path: no primary key declared — whole-row hash dedup at the
    boundary means a re-run over the same data loads nothing twice."""
    inc = Incremental("created_at")
    loaded = clicks.filter(F.col("created_at") <= "2024-01-02")
    inc.update_state(loaded)
    assert len(inc.boundary_hashes) == 2  # rows 2,3 at boundary (row hash)
    out = inc.apply(clicks.filter(F.col("created_at").isNotNull()))
    assert {r["id"] for r in out.collect()} == {4}
    # a genuinely NEW row at the same boundary value is kept
    extra = clicks.sparkSession.createDataFrame(
        [(99, "2024-01-02 00:00:00", 9.9)], "id long, created_at string, value double"
    ).withColumn("created_at", F.to_timestamp("created_at"))
    out2 = inc.apply(clicks.filter(F.col("created_at").isNotNull()).unionByName(extra))
    assert {r["id"] for r in out2.collect()} == {4, 99}


def test_state_serialization_roundtrip(clicks):
    inc = Incremental("created_at", primary_key=["id"], range_start="closed")
    inc.update_state(clicks.filter(F.col("created_at").isNotNull()))
    blob = inc.to_state()
    inc2 = Incremental("created_at", primary_key=["id"], range_start="closed").restore_state(blob)
    assert inc2.last_value == inc.last_value
    assert inc2.boundary_hashes == inc.boundary_hashes


def test_lag_numeric_and_datetime():
    inc = Incremental("x", initial_value=100, lag=10)
    cond = str(inc.filter_condition())
    assert "90" in cond  # lag widened the window
    inc_ts = Incremental(
        "ts", initial_value=dt.datetime(2024, 1, 1, 12, 0, 0), lag=3600.0
    )
    assert "11:00:00" in str(inc_ts.filter_condition())


def test_boundary_spill_date_cursor(spark, tmp_path):
    """Coarse date cursor: boundary covers 30% of the table -> hash set
    exceeds boundary_hash_limit and spills to a parquet state table; dedup
    then runs as an anti-join, never a driver-side list."""
    import datetime as dt

    n = 100
    rows = [
        (i, dt.date(2024, 1, 1) if i < 70 else dt.date(2024, 1, 2), float(i))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, d date, value double")
    spill = str(tmp_path / "boundary")
    inc = Incremental(
        "d", primary_key=["id"], range_start="closed",
        boundary_hash_limit=10, spill_path=spill,
    )
    inc.update_state(df)
    assert inc.last_value == dt.date(2024, 1, 2)
    assert inc.boundary_spilled and inc.boundary_hashes == []

    # next batch: re-reads boundary date; 30 old boundary rows must drop,
    # 5 new boundary rows and 5 post-boundary rows must survive
    rows2 = (
        [(i, dt.date(2024, 1, 2), float(i)) for i in range(70, 100)]  # seen
        + [(i, dt.date(2024, 1, 2), float(i)) for i in range(100, 105)]  # new @boundary
        + [(i, dt.date(2024, 1, 3), float(i)) for i in range(105, 110)]  # after
    )
    df2 = spark.createDataFrame(rows2, "id long, d date, value double")
    got = {r["id"] for r in inc.apply(df2).collect()}
    assert got == set(range(100, 110))

    # state round-trips the spill pointer
    state = inc.to_state()
    assert state["boundary_spilled"] and state["boundary_path"] == spill
    inc2 = Incremental("d", primary_key=["id"]).restore_state(state)
    got2 = {r["id"] for r in inc2.apply(df2).collect()}
    assert got2 == set(range(100, 110))


def test_boundary_spill_small_set_stays_inline(spark):
    import datetime as dt

    rows = [(i, dt.date(2024, 1, 1), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, d date, value double")
    inc = Incremental("d", primary_key=["id"], boundary_hash_limit=10)
    inc.update_state(df)
    assert not inc.boundary_spilled and len(inc.boundary_hashes) == 5
