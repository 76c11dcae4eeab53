"""Orchestration helpers (reference ``dlt/helpers``): the dbt-style SQL
model DAG runner.  The reference shells out to a dbt process against the
destination (``dlt/helpers/dbt/runner.py``); here the models run on the
SAME Spark session as the pipeline — Catalyst optimizes across model
boundaries instead of each model being an opaque warehouse statement.
"""

from .models import ModelChainError, run_model_chain, topo_order
from .scheduler import PipelineTask, pipeline_tasks, run_tasks

__all__ = [
    "run_model_chain",
    "topo_order",
    "ModelChainError",
    "PipelineTask",
    "pipeline_tasks",
    "run_tasks",
]
