"""Orchestrator-agnostic pipeline task decomposition (reference
``dlt/helpers/airflow_helper.py PipelineTasksGroup.add_run`` — there the
output is Airflow operators; here it is plain named thunks with upstream
edges that ANY scheduler consumes: wrap each ``task.run`` in an Airflow
PythonOperator, a Dagster op, or a cron step and wire ``task.upstream``
as the dependencies.  Airflow itself is not a Spark-engine concern, so
no airflow import exists on this path).

Decomposition strategies (reference ``add_run(decompose=...)``,
``airflow_helper.py:358``):

- ``"none"``       — one task running the whole source.
- ``"serialize"``  — one task per connected component of the resource
  DAG (``DltSource.decompose("scc")``), chained linearly in declaration
  order: component k depends on component k-1.  Matches the reference's
  serialized task list where the FIRST task initializes state/schema and
  the rest reuse it.
- ``"parallel"``   — first component runs alone (state/schema init —
  the reference's ``serialize_first_task=True`` default), every other
  component depends only on it and fans out concurrently.  All tasks
  share one pipeline, so loads land in one dataset/state lineage.
- ``"parallel-isolated"`` — every component gets its OWN pipeline
  (name suffixed with the component's lead resource, same destination
  and dataset), no cross-dependencies: full state/schema isolation, the
  mode for resources owned by different teams/schedules.

Scale note: decomposition changes ORCHESTRATION, not plans — each task
still runs the normal extract→normalize→load on the shared Spark
session, so per-component Spark jobs are exactly the jobs the monolithic
run would submit; "parallel" only helps when the orchestrator overlaps
waiting (API-bound extracts) with cluster-bound loads.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Callable, List

if TYPE_CHECKING:  # pragma: no cover
    from ..pipeline.pipeline import Pipeline
    from ..pipeline.resources import DltSource

_STRATEGIES = ("none", "serialize", "parallel", "parallel-isolated")


@dataclass
class PipelineTask:
    """One schedulable unit: call :attr:`run` after every name in
    :attr:`upstream` has completed."""

    name: str
    run: Callable[[], Any]
    upstream: List[str] = field(default_factory=list)


def pipeline_tasks(
    pipeline: "Pipeline",
    source: "DltSource",
    decompose: str = "none",
    **run_kwargs: Any,
) -> List[PipelineTask]:
    """Decompose ``pipeline.run(source)`` into dependency-ordered tasks
    (see module docstring for the strategies).  ``run_kwargs`` pass
    through to every ``pipeline.run`` call (write_disposition, ...)."""
    from ..pipeline.resources import DltSource

    if decompose not in _STRATEGIES:
        raise ValueError(
            f"decompose must be one of {_STRATEGIES}, got {decompose!r}"
        )
    if decompose == "none":
        return [
            PipelineTask(
                name=f"{pipeline.pipeline_name}.{source.name}",
                run=lambda: pipeline.run(source, **run_kwargs),
            )
        ]
    if not isinstance(source, DltSource):
        # reference: "Can only decompose dlt sources"
        raise ValueError("can only decompose a DltSource")
    components = source.decompose("scc")

    def _lead(comp: "DltSource") -> str:
        return next(iter(comp.resources))

    def _make(comp: "DltSource", pl: "Pipeline") -> Callable[[], Any]:
        return lambda: pl.run(comp, **run_kwargs)

    tasks: List[PipelineTask] = []
    if decompose == "serialize":
        for comp in components:
            tasks.append(
                PipelineTask(
                    name=f"{pipeline.pipeline_name}.{_lead(comp)}",
                    run=_make(comp, pipeline),
                    upstream=[tasks[-1].name] if tasks else [],
                )
            )
        return tasks
    if decompose == "parallel":
        for i, comp in enumerate(components):
            tasks.append(
                PipelineTask(
                    name=f"{pipeline.pipeline_name}.{_lead(comp)}",
                    run=_make(comp, pipeline),
                    upstream=[] if i == 0 else [tasks[0].name],
                )
            )
        return tasks
    # parallel-isolated: one cloned pipeline per component, no edges.
    # Pipeline.clone carries the FULL construction config (naming,
    # max_identifier_length, json_as_variant, rotation, progress, schema
    # import/export) so isolated components normalize and load exactly
    # like the monolithic run would.
    for comp in components:
        lead = _lead(comp)
        iso = pipeline.clone(f"{pipeline.pipeline_name}-{lead}")
        tasks.append(
            PipelineTask(
                name=f"{iso.pipeline_name}.{lead}",
                run=_make(comp, iso),
            )
        )
    return tasks


def run_tasks(tasks: List[PipelineTask]) -> "dict[str, Any]":
    """Reference executor for environments without an orchestrator (and
    the test harness): runs tasks respecting ``upstream`` edges, returns
    ``{task_name: run() result}``."""
    done: "dict[str, Any]" = {}
    pending = list(tasks)
    while pending:
        ready = [t for t in pending if all(u in done for u in t.upstream)]
        if not ready:
            raise ValueError(
                f"dependency cycle or unknown upstream among "
                f"{[t.name for t in pending]!r}"
            )
        for t in ready:
            done[t.name] = t.run()
            pending.remove(t)
    return done
