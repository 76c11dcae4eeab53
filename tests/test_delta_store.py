"""Delta binding tests.

The store contract suite runs only when delta-spark is importable (it is
not in this container — no pip installs — so these skip); the gating
behavior itself is always tested."""

import pytest

from dlt_spark.store.delta_store import DELTA_AVAILABLE, DeltaTableStore


def test_gate_raises_clearly_without_runtime(spark, tmp_path):
    if DELTA_AVAILABLE:
        pytest.skip("delta runtime present; gate not reachable")
    with pytest.raises(RuntimeError, match="delta-spark is not installed"):
        DeltaTableStore(spark, str(tmp_path), "ds")


@pytest.mark.skipif(not DELTA_AVAILABLE, reason="delta-spark not installed")
def test_delta_store_contract(spark, tmp_path):
    """Same contract assertions the parquet store passes in
    test_store_and_components.py."""
    store = DeltaTableStore(spark, str(tmp_path), "ds")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    store.append(df, "t")
    assert store.exists("t")
    assert store.read("t").count() == 2
    store.append(spark.createDataFrame([(3, "c")], "id long, v string"), "t")
    assert store.read("t").count() == 3
    store.overwrite(df, "t")
    assert store.read("t").count() == 2
    store.truncate("t")
    assert store.read("t").count() == 0
    assert store.list_tables() == ["t"]
    store.drop("t")
    assert not store.exists("t")


@pytest.mark.skipif(not DELTA_AVAILABLE, reason="delta-spark not installed")
def test_pipeline_runs_on_delta_store(spark, tmp_path):
    import dlt_spark

    pipe = dlt_spark.pipeline("pd", str(tmp_path / "dest"), "ds", spark)
    pipe.store = DeltaTableStore(spark, str(tmp_path / "dest"), "ds")
    pipe.run([{"id": 1}], table_name="t")
    assert pipe.dataset()["t"].row_count() == 1
