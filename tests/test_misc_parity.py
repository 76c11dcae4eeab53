"""Misc parity pins: identifier truncation in pipelines, scd2 knobs,
source selection, arrow fetch surfaces."""

import pytest
from pyspark.sql import functions as F

import dlt_spark


def test_pipeline_identifier_truncation(spark, tmp_path):
    pipe = dlt_spark.pipeline(
        "trunc", str(tmp_path / "d"), "ds", spark, max_identifier_length=20
    )
    long_col = "averyveryverylongcolumnnameindeed"
    pipe.run([{"id": 1, long_col: "x"}], table_name="t")
    cols = pipe.dataset()["t"].columns
    assert all(len(c) <= 20 for c in cols)
    # the truncated name is deterministic and distinct from the raw prefix
    truncated = [c for c in cols if c not in ("id", "_dlt_id", "_dlt_load_id")]
    assert len(truncated) == 1 and len(truncated[0]) == 20


def test_scd2_custom_validity_and_active_literal(spark):
    from dlt_spark.load.dispositions import scd2_apply

    s1 = spark.createDataFrame([(1, "a")], "nk long, v string")
    s2 = spark.createDataFrame([(1, "b")], "nk long, v string")
    dim1 = scd2_apply(
        None, s1, boundary_ts="2024-01-01 00:00:00",
        valid_from_col="vf", valid_to_col="vt", active_literal="9999-12-31 00:00:00",
    )
    dim2 = scd2_apply(
        dim1, s2, boundary_ts="2024-02-01 00:00:00",
        valid_from_col="vf", valid_to_col="vt", active_literal="9999-12-31 00:00:00",
    )
    rows = {(r["v"]): (str(r["vf"]), str(r["vt"])) for r in dim2.collect()}
    assert rows["a"] == ("2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert rows["b"] == ("2024-02-01 00:00:00", "9999-12-31 00:00:00")


def test_source_with_resources_selection(spark, tmp_path):
    from dlt_spark.pipeline.resources import DltResource, DltSource

    src = DltSource(
        "s",
        [DltResource([{"a": 1}], name="keep"), DltResource([{"b": 1}], name="skip")],
    ).with_resources("keep")
    pipe = dlt_spark.pipeline("sel", str(tmp_path / "d"), "ds", spark)
    pipe.run(src)
    names = pipe.dataset().table_names()
    assert "keep" in names and "skip" not in names


def test_arrow_fetch_surfaces(spark, tmp_path):
    pipe = dlt_spark.pipeline("ar", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": i} for i in range(5)], table_name="t")
    rel = pipe.dataset()["t"].select("id").order_by("id")
    tbl = rel.arrow()
    assert tbl.num_rows == 5
    # native toArrow() path: arrow types come straight from Spark, no
    # pandas intermediary (int64 stays int64, schema carried through)
    import pyarrow as pa

    assert isinstance(tbl, pa.Table) and tbl.schema.field("id").type == pa.int64()
    assert hasattr(rel._df, "toArrow")  # Spark 4 native path exists
    chunks = list(rel.iter_arrow(chunk_size=2))
    assert sum(c.num_rows for c in chunks) == 5
    batches = list(rel.iter_fetch(chunk_size=2))
    assert [len(b) for b in batches] == [2, 2, 1]
    assert rel.fetchmany(3) == [(0,), (1,), (2,)]


def test_to_ibis_is_gated_on_optional_dependency(spark):
    """to_ibis (reference relation.py:293) exists for API parity; without
    the optional ibis package it must fail with a pointer to spark_df()."""
    from dlt_spark.dataset.relation import Relation

    rel = Relation(spark.range(3).toDF("id"), "t")
    try:
        import ibis  # noqa: F401

        tbl = rel.to_ibis()
        assert tbl.count().execute() == 3
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match="spark_df"):
            rel.to_ibis()


def test_spark_session_factory_scale_posture(spark):
    """The session factory applies the engine's scale defaults without
    clobbering an existing session's master."""
    import dlt_spark
    from dlt_spark.session import SCALE_DEFAULTS

    s = dlt_spark.spark_session(shuffle_partitions=8, overrides={"spark.sql.session.timeZone": "UTC"})
    for k in ("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled"):
        assert s.conf.get(k) == "true"
    assert s.conf.get("spark.sql.session.timeZone") == "UTC"


def test_source_tables_lineage(spark, tmp_path):
    """Table-level provenance through joins (reference lineage analog)."""
    import dlt_spark

    pipe = dlt_spark.pipeline("lin", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": i, "v": i * 2} for i in range(5)], table_name="a")
    pipe.run([{"id": i, "w": i * 3} for i in range(5)], table_name="b")
    ds = pipe.dataset()
    rel = ds["a"].join(ds["b"], kind="inner", on=["id"])
    assert set(rel.source_tables()) >= {"a", "b"}
    assert len(rel.source_files()) >= 2
