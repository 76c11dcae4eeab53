"""Orchestrator-agnostic pipeline decomposition
(dlt_spark/helpers/scheduler.py + DltSource.decompose — reference
dlt/helpers/airflow_helper.py add_run + dlt/extract/source.py:515)."""

import pytest

from dlt_spark.pipeline.resources import DltResource, DltSource


def _demo_source():
    from dlt_spark import transformer

    parent = DltResource([{"id": 1}, {"id": 2}], name="users")
    child = transformer(name="user_events")(
        lambda item: [{"uid": item["id"], "n": item["id"] * 10}]
    )
    orders = DltResource([{"o": 1}, {"o": 2}, {"o": 3}], name="orders")
    items = DltResource([{"i": 9}], name="items")
    return DltSource("shop", [parent, parent | child, orders, items])


def test_decompose_scc_groups_transformer_with_parent():
    src = _demo_source()
    comps = src.decompose("scc")
    names = [list(c.resources) for c in comps]
    assert names == [["users", "user_events"], ["orders"], ["items"]]
    # "none" passes through; unknown strategy raises like the reference
    assert src.decompose("none") == [src]
    with pytest.raises(ValueError):
        src.decompose("bogus")


def test_decompose_unions_siblings_of_unselected_parent():
    # the reference builds SCCs over the FULL pipe DAG then intersects
    # with selected (source.py:515): two selected transformers of one
    # UNSELECTED parent still land in one component
    from dlt_spark import transformer

    parent = DltResource([{"id": 1}], name="users")
    t1 = transformer(name="t_one")(lambda item: [item])
    t2 = transformer(name="t_two")(lambda item: [item])
    lone = DltResource([{"x": 1}], name="lone")
    src = DltSource("s", [parent, parent | t1, parent | t2, lone])
    src.with_resources("t_one", "t_two", "lone")
    comps = src.decompose("scc")
    names = [sorted(c.resources) for c in comps]
    assert sorted(map(tuple, names)) == [("lone",), ("t_one", "t_two")]


def test_serialize_and_parallel_task_edges(spark, tmp_path):
    import dlt_spark
    from dlt_spark.helpers import pipeline_tasks

    p = dlt_spark.pipeline("sched_p", str(tmp_path / "d"), "ds", spark)
    ser = pipeline_tasks(p, _demo_source(), decompose="serialize")
    assert [t.upstream for t in ser] == [[], [ser[0].name], [ser[1].name]]
    par = pipeline_tasks(p, _demo_source(), decompose="parallel")
    # first task (state/schema init) has no upstream; the rest fan out of it
    assert par[0].upstream == []
    assert all(t.upstream == [par[0].name] for t in par[1:])
    with pytest.raises(ValueError, match="decompose"):
        pipeline_tasks(p, _demo_source(), decompose="nope")
    with pytest.raises(ValueError, match="DltSource"):
        pipeline_tasks(p, [{"x": 1}], decompose="serialize")


def test_run_tasks_loads_all_components(spark, tmp_path):
    import dlt_spark
    from dlt_spark.helpers import pipeline_tasks, run_tasks

    p = dlt_spark.pipeline("sched_run", str(tmp_path / "d"), "ds", spark)
    done = run_tasks(pipeline_tasks(p, _demo_source(), decompose="serialize"))
    assert len(done) == 3
    ds = p.dataset()
    assert ds["users"].row_count() == 2
    assert ds["user_events"].row_count() == 2
    assert ds["orders"].row_count() == 3
    assert ds["items"].row_count() == 1


def test_parallel_isolated_pipelines_share_dataset(spark, tmp_path):
    import dlt_spark
    from dlt_spark.helpers import pipeline_tasks, run_tasks

    p = dlt_spark.pipeline("sched_iso", str(tmp_path / "d"), "ds", spark)
    tasks = pipeline_tasks(p, _demo_source(), decompose="parallel-isolated")
    assert all(t.upstream == [] for t in tasks)
    # isolated: distinct pipeline name per component in the task name
    assert {t.name.split(".")[0] for t in tasks} == {
        "sched_iso-users", "sched_iso-orders", "sched_iso-items",
    }
    run_tasks(tasks)
    # same destination dataset receives every component's tables
    ds = p.dataset()
    assert ds["user_events"].row_count() == 2
    assert ds["orders"].row_count() == 3


def test_parallel_isolated_clones_carry_pipeline_config(spark, tmp_path):
    # clones must normalize/load with the parent's full construction
    # config — naming convention, identifier cap, variant mode, rotation
    import dlt_spark
    from dlt_spark.helpers import pipeline_tasks, run_tasks

    p = dlt_spark.pipeline(
        "sched_cfg", str(tmp_path / "d"), "ds", spark,
        naming="duck_case", max_identifier_length=40,
        max_rows_per_file=7, json_as_variant=False,
    )
    src = DltSource(
        "s", [DltResource([{"CamelCase": 1, "Plain": 2}], name="MixedTbl")]
    )
    tasks = pipeline_tasks(p, src, decompose="parallel-isolated")
    iso_runs = run_tasks(tasks)
    assert len(iso_runs) == 1
    clone = p.clone("probe")
    assert clone.destination == p.destination
    assert clone.dataset_name == p.dataset_name
    assert type(clone.schema.naming) is type(p.schema.naming)
    assert clone.schema.naming.max_length == p.schema.naming.max_length
    assert clone.store.max_rows_per_file == p.store.max_rows_per_file
    assert clone.json_as_variant == p.json_as_variant
    # the isolated run used the parent's naming convention: duck_case
    # keeps the original casing (snake_case would fold it)
    cols = set(p.dataset()["MixedTbl"].spark_df().columns)
    assert "CamelCase" in cols and "Plain" in cols
