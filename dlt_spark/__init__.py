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
    DltSource,
    DltTransformer,
    ModelResource,
    mark,
    model,
    resource,
    source,
    transformer,
)
from .schema.schema import Schema, SchemaContractViolation
from .session import spark_session

__version__ = "0.1.0"

__all__ = [
    "spark_session",
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
