"""dbt-style SQL model DAG on Spark (reference ``dlt/helpers/dbt`` —
``runner.py:run_dbt_package`` shells a dbt process at the destination;
this is the Spark-native re-expression: the same ``{{ ref(...) }}`` /
``{{ source(...) }}`` dependency graph, resolved and executed by
Catalyst in ONE session).

A *model* is a named SELECT statement.  Models reference each other with
``{{ ref('model_name') }}`` and raw input tables with
``{{ source('table_name') }}`` (both quote styles accepted, whitespace
tolerant — the subset of dbt-jinja that defines the DAG; loops/macros
are intentionally out of scope).  ``run_model_chain`` topologically
sorts the graph, rejects cycles and unknown references with the full
offending path, and returns one DataFrame per model.

Scale shape — why "view" materialization is the default: each model
becomes a temp view, so a downstream model's plan INLINES its whole
upstream chain and Catalyst optimizes across model boundaries — filters
written in a mart push down into the staging scan, unused columns prune
all the way to parquet, and a dim referenced by two marts dedupes via
ReusedExchange.  dbt-on-warehouse materializes every model as a table
by default, paying a full write + re-read per edge; at 100 TB that is
the difference between one pipelined job and N materialization
barriers.  Opt INTO a barrier per model (``materialize={'name'}``)
only where a model fans out to many consumers AND its recompute is
provably not deduped (measure first: ReusedExchange already covers the
common diamond), or where a mid-DAG result must persist for audit —
those write through the normal pipeline/store path instead
(``pipeline.run(dlt.model(...))``).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Mapping, Optional, Set

from pyspark.sql import DataFrame, SparkSession

_REF_RE = re.compile(
    r"\{\{\s*(ref|source)\s*\(\s*['\"]([A-Za-z_][A-Za-z0-9_]*)['\"]\s*\)\s*\}\}"
)


class ModelChainError(ValueError):
    """Cycle or unknown reference in a model DAG."""


def _deps(sql: str) -> "List[tuple[str, str]]":
    """All ``(kind, name)`` references in one model's SQL."""
    return [(m.group(1), m.group(2)) for m in _REF_RE.finditer(sql)]


def topo_order(models: Mapping[str, str]) -> List[str]:
    """Dependency-respecting execution order (deterministic: insertion
    order among ready nodes).  Raises :class:`ModelChainError` naming
    the cycle members or the unknown ``ref``."""
    graph: Dict[str, Set[str]] = {}
    for name, sql in models.items():
        refs = {n for kind, n in _deps(sql) if kind == "ref"}
        unknown = refs - set(models)
        if unknown:
            raise ModelChainError(
                f"model {name!r} refs unknown model(s) {sorted(unknown)!r}; "
                f"known models: {sorted(models)!r}"
            )
        graph[name] = refs
    order: List[str] = []
    done: Set[str] = set()
    while len(order) < len(models):
        ready = [n for n in models if n not in done and graph[n] <= done]
        if not ready:
            cycle = sorted(set(models) - done)
            raise ModelChainError(f"cycle among models {cycle!r}")
        order.extend(ready)
        done.update(ready)
    return order


def run_model_chain(
    spark: SparkSession,
    models: Mapping[str, str],
    sources: Optional[Mapping[str, DataFrame]] = None,
    materialize: Iterable[str] = (),
    view_prefix: str = "_dlt_model_",
) -> Dict[str, DataFrame]:
    """Execute a model DAG; returns ``{model_name: DataFrame}``.

    ``sources`` maps ``{{ source('t') }}`` names to input DataFrames
    (omit to reference tables already registered on the session).
    Models in ``materialize`` get an eager ``localCheckpoint`` barrier —
    their consumers re-read the checkpointed partitions instead of
    inlining the subplan (see module docstring for when that is and is
    not worth it).  Everything else stays a lazy temp view so Catalyst
    plans across the whole chain.
    """
    materialize = set(materialize)
    unknown_mat = materialize - set(models)
    if unknown_mat:
        raise ModelChainError(
            f"materialize names unknown model(s) {sorted(unknown_mat)!r}"
        )
    src_views: Dict[str, str] = {}
    for t, df in (sources or {}).items():
        v = f"{view_prefix}src_{t}"
        # a model literally named "src_<t>" would land on the same view
        # name and silently shadow the source — reject it loudly
        if f"src_{t}" in models:
            raise ModelChainError(
                f"model name 'src_{t}' collides with the registered view "
                f"of source {t!r}; rename the model"
            )
        df.createOrReplaceTempView(v)
        src_views[t] = v

    def _resolve(sql: str) -> str:
        def sub(m: "re.Match[str]") -> str:
            kind, name = m.group(1), m.group(2)
            if kind == "ref":
                return f"{view_prefix}{name}"
            return src_views.get(name, name)

        return _REF_RE.sub(sub, sql)

    out: Dict[str, DataFrame] = {}
    for name in topo_order(models):
        df = spark.sql(_resolve(models[name]))
        if name in materialize:
            df = df.localCheckpoint(eager=True)
        df.createOrReplaceTempView(f"{view_prefix}{name}")
        out[name] = df
    return out
