"""Pipeline state persisted to the destination.

Re-expression of ``dlt/pipeline/state_sync.py:95-139`` and the
``_dlt_pipeline_state`` table (``dlt/common/schema/utils.py:1398``): a
versioned JSON blob appended once per state change; restore reads the
highest version.  Holds incremental cursors and arbitrary
``dlt.current.state()``-style user state.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schema.typing import STATE_TABLE_NAME
from ..store.table_store import TableStore


class PipelineState:
    def __init__(self, pipeline_name: str) -> None:
        self.pipeline_name = pipeline_name
        self.version = 0
        self.state: Dict[str, Any] = {"sources": {}}

    # -- accessors --

    def source_state(self, source: str) -> Dict[str, Any]:
        return self.state["sources"].setdefault(source, {})

    def resource_state(self, source: str, resource: str) -> Dict[str, Any]:
        return self.source_state(source).setdefault("resources", {}).setdefault(resource, {})

    # -- persistence --

    def persist(self, spark: SparkSession, store: TableStore, load_id: str) -> None:
        import datetime as dt

        import pyarrow as pa

        self.version += 1
        schema = pa.schema(
            [
                ("version", pa.int32()),
                ("pipeline_name", pa.string()),
                ("state", pa.string()),
                ("_dlt_load_id", pa.string()),
                ("created_at", pa.timestamp("us", tz="UTC")),
            ]
        )
        # driver-side control-plane append — no distributed job for one row
        store.append_rows(
            [
                {
                    "version": self.version,
                    "pipeline_name": self.pipeline_name,
                    "state": json.dumps(self.state, default=str),
                    "_dlt_load_id": load_id,
                    "created_at": dt.datetime.now(dt.timezone.utc),
                }
            ],
            STATE_TABLE_NAME,
            schema,
        )

    @classmethod
    def restore(
        cls, store: TableStore, pipeline_name: str
    ) -> Optional["PipelineState"]:
        """Restore the newest COMMITTED state: only rows whose
        ``_dlt_load_id`` appears in ``_dlt_loads`` count.  A crash between
        the state append and the loads-row commit leaves an orphan state
        row; honoring it would advance the cursor past a package readers
        consider uncommitted, silently dropping those rows forever
        (reference keeps state inside the load package so the two commit
        together — this filter is the equivalent guarantee)."""
        from ..schema.typing import LOADS_TABLE_NAME

        if not store.exists(STATE_TABLE_NAME):
            return None
        df = store.read(STATE_TABLE_NAME).filter(
            F.col("pipeline_name") == pipeline_name
        )
        if store.exists(LOADS_TABLE_NAME):
            committed = (
                store.read(LOADS_TABLE_NAME)
                .filter(F.col("status") == 0)
                .select(F.col("load_id").alias("_dlt_load_id"))
                .distinct()
            )
            df = df.join(F.broadcast(committed), on="_dlt_load_id", how="left_semi")
        else:
            return None
        rows = df.orderBy(F.col("version").desc()).limit(1).collect()
        if not rows:
            return None
        st = cls(pipeline_name)
        st.version = rows[0]["version"]
        st.state = json.loads(rows[0]["state"])
        return st
