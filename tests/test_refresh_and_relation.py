"""Refresh modes (reference test_refresh_modes.py) + Relation surface
details (reference tests/dataset/test_relation.py)."""

import pytest

import dlt_spark


@pytest.fixture()
def loaded(spark, tmp_path):
    pipe = dlt_spark.pipeline("rf", str(tmp_path / "d"), "ds", spark)
    pipe.run(
        [{"id": 1, "items": [{"v": 1}]}, {"id": 2, "items": [{"v": 2}]}],
        table_name="a",
    )
    pipe.run([{"id": 10}], table_name="b")
    return pipe


def test_refresh_drop_sources(loaded):
    loaded.run([{"id": 3}], table_name="a", refresh="drop_sources")
    ds = loaded.dataset()
    assert ds["a"].row_count() == 1
    # b dropped too (whole dataset)
    with pytest.raises(Exception):
        ds["b"].row_count()


def test_refresh_drop_resources(loaded):
    loaded.run([{"id": 3}], table_name="a", refresh="drop_resources")
    ds = loaded.dataset()
    assert ds["a"].row_count() == 1
    assert ds["b"].row_count() == 1  # untouched
    # nested table of a dropped with it (and not recreated: no new items)
    with pytest.raises(Exception):
        ds["a__items"].row_count()


def test_refresh_drop_data(loaded):
    loaded.run([{"id": 3}], table_name="a", refresh="drop_data")
    assert loaded.dataset()["a"].row_count() == 1
    assert loaded.dataset()["b"].row_count() == 1


def test_relation_surface(loaded):
    ds = loaded.dataset()
    rel = ds["a"]
    assert rel.where("id", "eq", 1).row_count() == 1
    assert rel.where("id", "ne", 1).row_count() == 1
    assert rel.where("id", "lte", 2).row_count() == 2
    assert rel.where("id", "not_in", [1]).row_count() == 1
    assert rel["id"].max() == 2
    assert rel["id"].min() == 1
    assert rel.select("id").order_by("id", "desc").fetchone() == (2,)
    assert rel.select("id").limit(1).row_count() == 1
    assert rel.head(1).row_count() == 1
    assert rel.select("id").where("id", "eq", 2).fetchscalar() == 2
    assert set(rel.columns_schema["id"].values()) == {"bigint"}
    chunks = list(rel.select("id").iter_df(chunk_size=1))
    assert len(chunks) == 2


def test_relation_parent_child_join(loaded):
    ds = loaded.dataset()
    joined = ds["a__items"].join(ds["a"], kind="inner", alias="root")
    rows = joined.spark_df().select("v", "id").collect()
    assert {(r["v"], r["id"]) for r in rows} == {(1, 1), (2, 2)}


def test_from_loads_and_query(loaded):
    ds = loaded.dataset()
    ids = ds.load_ids()
    assert len(ids) == 2
    first_load = ds["a"].from_loads([ids[0]])
    assert first_load.row_count() == 2  # only batch-1 rows
    out = ds.query("SELECT count(*) AS n FROM a").fetchscalar()
    assert out == 2
    assert ds.latest_load_id == ids[-1]


def test_row_counts_includes_dlt_tables(loaded):
    ds = loaded.dataset()
    counts = dict(ds.row_counts(table_names=ds.table_names(include_dlt=True)).fetchall())
    assert counts["_dlt_loads"] == 2
    assert counts["a"] == 2


def test_relation_set_ops(loaded):
    ds = loaded.dataset()
    a = ds["a"].select("id")
    b = ds["b"].select("id")
    # a has ids {1,2}, b has {10}
    assert sorted(r[0] for r in a.union(b).fetchall()) == [1, 2, 10]
    assert a.union(a).row_count() == 4  # UNION ALL keeps duplicates
    assert a.union(a, distinct=True).row_count() == 2
    assert a.intersect(b).row_count() == 0
    assert sorted(r[0] for r in a.intersect(a).fetchall()) == [1, 2]
    assert sorted(r[0] for r in a.except_(b).fetchall()) == [1, 2]
    assert a.except_(a).row_count() == 0
