"""dlt_spark — a PySpark-native ELT/analytics engine with the query and
data-processing capabilities of dlt-hub/dlt (see SURVEY.md), built
Spark-first: DataFrames are the only data plane, Catalyst is the
optimizer, and the load substrate is a swappable TableStore
(parquet copy-on-write here; Delta/Iceberg in production).
"""

from . import functions  # noqa: F401  (scalar function layer, SURVEY §2.I)
from .config import config, secrets  # noqa: F401  (dlt.config / dlt.secrets analog)
from .dataset.dataset import Dataset, dataset
from .dataset.relation import Relation
from .incremental import Incremental, incremental
from .load.destination import CustomDestination, destination
from .pipeline.pipeline import CannotAttachPipeline, LoadInfo, Pipeline, attach, pipeline
from .pipeline.resources import (
    DltResource,
    defer,
    DltSource,
    DltTransformer,
    ModelResource,
    mark,
    model,
    resource,
    source,
    transformer,
)
from .pipeline import current  # noqa: F401  (dlt.current analog)
from .pipeline import progress  # noqa: F401  (dlt.progress analog — collectors)
from .schema.schema import Schema, SchemaContractViolation
from .session import spark_session


def run(data, *, pipeline_name: str = "dlt_spark", destination: str = None,
        dataset_name: str = "default", spark=None, **kwargs):
    """Module-level ``dlt.run`` convenience (reference ``dlt/__init__.py``
    run): build (or reuse) a pipeline and run ``data`` through it.
    ``destination`` is the table-store root path; when omitted, a STABLE
    per-``pipeline_name`` directory under the system temp dir is used so
    repeated calls attach to the same store (state, schema, and loaded
    data accumulate — the reference's named-pipeline reuse)."""
    import os
    import tempfile

    root = destination or os.path.join(
        tempfile.gettempdir(), f"dlt_spark_{pipeline_name}"
    )
    pipe = pipeline(pipeline_name, root, dataset_name, spark)
    return pipe.run(data, **kwargs)


def state():
    """``dlt.state()`` analog: the source-scope state dict of the
    pipeline currently executing ``run`` (persisted at commit)."""
    return current.source_state()

__version__ = "0.1.0"

__all__ = [
    "spark_session",
    "run",
    "state",
    "current",
    "defer",
    "attach",
    "CannotAttachPipeline",
    "config",
    "secrets",
    "CustomDestination",
    "Dataset",
    "dataset",
    "DltResource",
    "destination",
    "functions",
    "DltSource",
    "DltTransformer",
    "Incremental",
    "LoadInfo",
    "Pipeline",
    "Relation",
    "Schema",
    "SchemaContractViolation",
    "incremental",
    "mark",
    "model",
    "ModelResource",
    "pipeline",
    "resource",
    "source",
    "transformer",
]
