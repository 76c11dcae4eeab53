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
