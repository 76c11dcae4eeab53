"""Pipeline — extract -> normalize -> load orchestration.

Re-expression of ``dlt.Pipeline`` (``dlt/pipeline/pipeline.py:428-774``)
collapsed to Spark's execution model (SURVEY §3.1 "Spark shape"): extract
and normalize are DataFrame construction + the relational normalizer (no
intermediate file packages, no process pools — Spark tasks are the
parallelism); load is the disposition write + the ``_dlt_loads`` commit.
The three-stage *API* (``extract()/normalize()/load()`` infos) is kept
for surface parity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from ..dataset.dataset import Dataset
from ..incremental import Incremental
from ..load.load import LoadStage
from ..normalize.relational import RelationalNormalizer
from ..schema.schema import Schema
from ..schema.spark_types import from_spark_type
from ..schema.typing import new_column, new_table
from ..store.table_store import ParquetTableStore, TableStore
from .resources import DltResource, DltSource
from .state import PipelineState


@dataclass
class LoadInfo:
    pipeline_name: str
    load_id: str
    dataset_name: str
    tables: List[str] = field(default_factory=list)
    row_counts: Dict[str, int] = field(default_factory=dict)

    def __str__(self) -> str:
        return (
            f"LoadInfo(pipeline={self.pipeline_name}, load_id={self.load_id},"
            f" tables={self.tables})"
        )


class Pipeline:
    def __init__(
        self,
        pipeline_name: str,
        destination: str,
        dataset_name: str = "default",
        spark: Optional[SparkSession] = None,
        dev_mode: bool = False,
    ) -> None:
        self.pipeline_name = pipeline_name
        self.dataset_name = dataset_name
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.store: TableStore = ParquetTableStore(self.spark, destination, dataset_name)
        self.schema = Schema(dataset_name)
        self.state = (
            PipelineState.restore(self.store, pipeline_name)
            or PipelineState(pipeline_name)
        )
        self._last_load_seq = 0.0
        if dev_mode:
            for t in self.store.list_tables():
                self.store.drop(t)

    # -- public API (mirrors dlt.Pipeline.run, pipeline.py:639) --

    def run(
        self,
        data: Any,
        *,
        table_name: Optional[str] = None,
        write_disposition: Optional[str] = None,
        primary_key: Optional[Union[str, Sequence[str]]] = None,
        merge_key: Optional[Union[str, Sequence[str]]] = None,
        merge_strategy: Optional[str] = None,
        incremental: Optional[Incremental] = None,
        columns: Optional[dict] = None,
        max_table_nesting: Optional[int] = None,
        refresh: Optional[str] = None,
        boundary_timestamp: Optional[str] = None,
    ) -> LoadInfo:
        resources = self._as_resources(
            data,
            table_name=table_name,
            write_disposition=write_disposition,
            primary_key=primary_key,
            merge_key=merge_key,
            merge_strategy=merge_strategy,
            incremental=incremental,
            columns=columns,
            max_table_nesting=max_table_nesting,
        )
        if refresh:
            self._apply_refresh(refresh, resources)

        load_id = self._new_load_id()
        loader = LoadStage(self.spark, self.store, self.schema)
        info = LoadInfo(self.pipeline_name, load_id, self.dataset_name)

        for res in resources:
            tables = res.materialize(self.spark)  # extract
            for tname, df in tables.items():
                root = self._normalize_and_register(res, tname, df, load_id, boundary_timestamp)
                normalized = root.pop("__tables__")
                loader.write_chain(normalized, root["schema"], load_id)
                info.tables.extend(normalized.keys())
            if res.incremental is not None:
                # cursor advances over the *loaded* window
                for tname, df in tables.items():
                    filtered = res.incremental.apply(df)
                    res.incremental.update_state(filtered)
                rstate = self.state.resource_state(self.dataset_name, res.name)
                rstate["incremental"] = res.incremental.to_state()

        self.schema.bump_version()
        loader.commit_schema()
        self.state.persist(self.spark, self.store, load_id)
        loader.commit_load(load_id, status=0)
        return info

    def dataset(self) -> Dataset:
        return Dataset(self.spark, self.store, self.schema)

    def drop(self) -> None:
        for t in self.store.list_tables():
            self.store.drop(t)

    # -- internals --

    def _apply_refresh(self, refresh: str, resources: List[DltResource]) -> None:
        """Refresh modes (reference ``dlt/pipeline/helpers.py:93-182``):
        ``drop_sources`` drops every table in the dataset;
        ``drop_resources`` drops the tables produced by the resources in
        this run (and their nested tables); ``drop_data`` truncates them
        but keeps schemas."""
        if refresh == "drop_sources":
            for t in self.store.list_tables():
                self.store.drop(t)
            self.schema = Schema(self.dataset_name)
            return
        targets: List[str] = []
        for r in resources:
            root = self.schema.naming.normalize_table_identifier(r._static_table_name())
            targets.append(root)
            targets.extend(
                t["name"] for t in self.schema.child_tables(root)
            ) if root in self.schema.tables else None
            # nested tables may exist in the store but not yet in schema
            targets.extend(
                t for t in self.store.list_tables() if t.startswith(root + "__")
            )
        for t in dict.fromkeys(targets):
            if refresh == "drop_resources":
                self.store.drop(t)
                self.schema.tables.pop(t, None)
            elif refresh == "drop_data":
                if self.store.exists(t):
                    self.store.truncate(t)
            else:
                raise ValueError(f"unknown refresh mode {refresh!r}")

    def _new_load_id(self) -> str:
        # strictly monotonic epoch string (reference load package ids)
        lid = max(time.time(), self._last_load_seq + 1e-6)
        self._last_load_seq = lid
        return f"{lid:.6f}"

    def _as_resources(self, data: Any, **hints: Any) -> List[DltResource]:
        incremental = hints.pop("incremental", None)
        clean = {k: v for k, v in hints.items() if v is not None}
        if isinstance(data, DltSource):
            out = data.selected_resources()
        elif isinstance(data, DltResource):
            out = [data]
        elif isinstance(data, (list, tuple)) and data and isinstance(data[0], DltResource):
            out = list(data)
        else:
            tname = clean.pop("table_name", None) or "content"
            out = [DltResource(data, name=tname, table_name=tname, **clean)]
            clean = {}
        for r in out:
            for k, v in clean.items():
                if k == "table_name":
                    r.table_name = v
                elif k in ("primary_key", "merge_key") and v is not None:
                    setattr(r, k, [v] if isinstance(v, str) else list(v))
                elif hasattr(r, k) and v is not None:
                    setattr(r, k, v)
            if incremental is not None and r.incremental is None:
                r.incremental = incremental
            # restore incremental cursor from pipeline state
            if r.incremental is not None:
                rstate = self.state.resource_state(self.dataset_name, r.name)
                if "incremental" in rstate:
                    r.incremental.restore_state(rstate["incremental"])
        return out

    def _normalize_and_register(
        self,
        res: DltResource,
        table_name: str,
        df: DataFrame,
        load_id: str,
        boundary_timestamp: Optional[str],
    ) -> Dict[str, Any]:
        disposition = res.write_disposition or "append"
        strategy = res.merge_strategy or (
            "delete-insert" if disposition == "merge" else None
        )
        if res.incremental is not None:
            df = res.incremental.apply(df)

        # row-id strategy per merge strategy (reference helpers.py:107-120:
        # delete-insert -> random, upsert -> key_hash, scd2 -> row_hash)
        row_id_type = "random"
        if strategy == "scd2":
            row_id_type = "row_hash"
        elif strategy in ("upsert", "insert-only") and res.primary_key:
            row_id_type = "key_hash"

        normalizer = RelationalNormalizer(
            naming=self.schema.naming,
            max_nesting=res.max_table_nesting or self.schema.settings.get("max_nesting", 100),
            root_key=disposition == "merge",
        )
        tables = normalizer.normalize(
            df,
            table_name,
            load_id=load_id,
            row_id_type=row_id_type,
            primary_key=res.primary_key,
        )

        root_name = self.schema.naming.normalize_table_identifier(table_name)
        cols = []
        root_df = tables[root_name]
        for f in root_df.schema.fields:
            c = new_column(f.name, **from_spark_type(f.dataType))
            if res.primary_key and f.name in res.primary_key:
                c["primary_key"] = True
            if res.merge_key and f.name in res.merge_key:
                c["merge_key"] = True
            for user_col in (res.columns or {}).values() if isinstance(res.columns, dict) else []:
                if user_col.get("name") == f.name:
                    c.update(user_col)
            cols.append(c)
        tbl = new_table(
            root_name,
            write_disposition=disposition,
            columns=cols,
            x_merge_strategy=strategy,
            x_boundary_timestamp=boundary_timestamp,
            resource=res.name,
        )
        registered = self.schema.update_table(tbl)
        for child_name, child_df in tables.items():
            if child_name == root_name:
                continue
            child_cols = [
                new_column(f.name, **from_spark_type(f.dataType))
                for f in child_df.schema.fields
            ]
            self.schema.update_table(
                new_table(child_name, parent=root_name, columns=child_cols)
            )
        return {"schema": registered, "__tables__": tables}


def pipeline(
    pipeline_name: str = "dlt_spark_pipeline",
    destination: str = "/tmp/dlt_spark_data",
    dataset_name: str = "default",
    spark: Optional[SparkSession] = None,
    dev_mode: bool = False,
) -> Pipeline:
    return Pipeline(pipeline_name, destination, dataset_name, spark, dev_mode)
