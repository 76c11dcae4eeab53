"""Table substrate: versioned copy-on-write parquet tables.

The reference loads into 23 destinations (``dlt/destinations/impl/*``);
this engine targets **one**: Spark-managed tables.  In production that is
Delta or Iceberg (atomic MERGE/replace, snapshot isolation, file skipping).
Neither runtime jar ships in this container, so :class:`ParquetTableStore`
provides the same *contract* on plain parquet:

- each commit writes a fresh ``v_{n}`` directory (copy-on-write) and then
  atomically flips a ``_current`` pointer file — readers never observe a
  half-written table (the moral equivalent of the Delta transaction log,
  one snapshot deep... plus history);
- ``append`` adds files to a *new* version dir listing prior files via a
  manifest, so appends are O(new data), not O(table);
- read-modify-write (merge/upsert/scd2) reads snapshot N and commits
  snapshot N+1 — safe because the input files are immutable.

Every operation is expressed through ``df.write.parquet`` /
``spark.read.parquet`` so swapping in Delta (``format("delta")`` +
``MERGE INTO``) or Iceberg is a one-class change — see
:class:`TableStore` for the interface the dispositions code against.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    """Interface the load stage programs against (Delta/Iceberg bindable)."""

    def exists(self, table: str) -> bool:
        raise NotImplementedError

    def read(self, table: str) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame, table: str, partition_by: Optional[List[str]] = None) -> None:
        raise NotImplementedError

    def append_rows(self, rows: List[dict], table: str, schema: "object" = None) -> None:
        """Control-plane append: a handful of metadata rows (load commits,
        schema versions, pipeline state) written from the driver WITHOUT
        launching a distributed job — a single-row `_dlt_loads` commit
        must not cost a cluster round-trip.  ``schema`` is a
        ``pyarrow.Schema``.  On a SQL-backed store this is a plain INSERT
        (which is exactly what the reference emits, ``load.py:605``)."""
        raise NotImplementedError

    def overwrite(self, df: DataFrame, table: str, partition_by: Optional[List[str]] = None) -> None:
        raise NotImplementedError

    def truncate(self, table: str) -> None:
        raise NotImplementedError

    def drop(self, table: str) -> None:
        raise NotImplementedError

    def list_tables(self) -> List[str]:
        raise NotImplementedError


class ParquetTableStore(TableStore):
    def __init__(self, spark: SparkSession, root: str, dataset: str = "default") -> None:
        self.spark = spark
        self.root = os.path.join(root, dataset)
        self.dataset = dataset
        os.makedirs(self.root, exist_ok=True)

    # -- layout helpers --

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_current")

    def _current_meta(self, table: str) -> Optional[dict]:
        p = self._pointer(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, meta: dict) -> None:
        """Atomic pointer flip via rename on the same filesystem."""
        d = self._table_dir(table)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix="_current.")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._pointer(table))

    def _next_version(self, table: str) -> int:
        meta = self._current_meta(table)
        return (meta["version"] + 1) if meta else 0

    def _data_paths(self, table: str) -> List[str]:
        meta = self._current_meta(table)
        if not meta:
            raise FileNotFoundError(f"table {table!r} does not exist in {self.root}")
        return meta["paths"]

    # -- TableStore API --

    def exists(self, table: str) -> bool:
        meta = self._current_meta(table)
        return bool(meta and meta["paths"])

    def read(self, table: str) -> DataFrame:
        paths = self._data_paths(table)
        if not paths:
            raise FileNotFoundError(f"table {table!r} is empty and schemaless")
        meta = self._current_meta(table) or {}
        if meta.get("partition_by") and len(paths) > 1:
            # hive-partitioned version dirs: partition discovery needs one
            # root per read — union the snapshots
            out = self.spark.read.parquet(paths[0])
            for p in paths[1:]:
                out = out.unionByName(self.spark.read.parquet(p), allowMissingColumns=True)
            return out
        return self.spark.read.parquet(*paths)

    def append(self, df: DataFrame, table: str, partition_by: Optional[List[str]] = None) -> None:
        v = self._next_version(table)
        new_dir = os.path.join(self._table_dir(table), f"v_{v:08d}")
        prev = self._current_meta(table)
        partition_by = partition_by or (prev or {}).get("partition_by")
        self._write(df, new_dir, partition_by)
        paths = (prev["paths"] if prev else []) + [new_dir]
        self._commit(table, {"version": v, "paths": paths, "partition_by": partition_by})

    def append_rows(self, rows: List[dict], table: str, schema: "object" = None) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.Table.from_pylist(rows, schema=schema)
        v = self._next_version(table)
        new_dir = os.path.join(self._table_dir(table), f"v_{v:08d}")
        os.makedirs(new_dir, exist_ok=True)
        pq.write_table(tbl, os.path.join(new_dir, "part-00000.parquet"))
        prev = self._current_meta(table)
        paths = (prev["paths"] if prev else []) + [new_dir]
        self._commit(
            table,
            {
                "version": v,
                "paths": paths,
                "partition_by": (prev or {}).get("partition_by"),
            },
        )

    def overwrite(self, df: DataFrame, table: str, partition_by: Optional[List[str]] = None) -> None:
        v = self._next_version(table)
        new_dir = os.path.join(self._table_dir(table), f"v_{v:08d}")
        prev = self._current_meta(table)
        partition_by = partition_by or (prev or {}).get("partition_by")
        self._write(df, new_dir, partition_by)
        # remember the full previous snapshot so vacuum never deletes dirs
        # that lazy DataFrames built from snapshot N-1 may still read
        # (a load package overwrites the root, then evaluates child plans
        # referencing the pre-overwrite root files)
        self._commit(
            table,
            {
                "version": v,
                "paths": [new_dir],
                "partition_by": partition_by,
                "prev_paths": (prev or {}).get("paths", []),
            },
        )
        self._vacuum(table)

    @staticmethod
    def _write(df: DataFrame, path: str, partition_by: Optional[List[str]]) -> None:
        """Hive-partitioned layout when partition hints are set — readers
        get partition pruning on those columns for free (the parquet
        analog of Delta partitioning / Iceberg partition specs)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def truncate(self, table: str) -> None:
        meta = self._current_meta(table)
        if meta is not None:
            v = self._next_version(table)
            # keep the partitioning contract across truncation — the next
            # append re-resolves partition_by from this commit
            self._commit(
                table,
                {
                    "version": v,
                    "paths": [],
                    "partition_by": meta.get("partition_by"),
                    "prev_paths": meta.get("paths", []),
                },
            )

    def drop(self, table: str) -> None:
        d = self._table_dir(table)
        if os.path.exists(d):
            shutil.rmtree(d)

    def list_tables(self) -> List[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            t
            for t in os.listdir(self.root)
            if os.path.exists(self._pointer(t)) and self.exists(t)
        )

    def compact(self, table: str, target_partitions: Optional[int] = None) -> None:
        """Rewrite the table into a single snapshot with right-sized files
        (the OPTIMIZE analog): append-heavy tables accumulate one dir per
        load; compaction folds them so readers open O(partitions) files.
        On Delta/Iceberg this maps to OPTIMIZE / rewrite_data_files."""
        df = self.read(table)
        if target_partitions:
            df = df.repartition(target_partitions)
        meta = self._current_meta(table) or {}
        self.overwrite(df, table, partition_by=meta.get("partition_by"))

    def _vacuum(self, table: str) -> None:
        """Remove version dirs referenced by neither the current commit
        nor the immediately previous snapshot (best-effort).  Protecting
        one generation back keeps in-flight lazy plans built from the
        pre-overwrite snapshot readable — the analog of Delta's VACUUM
        retention window.  Use :meth:`vacuum` for a full history purge."""
        meta = self._current_meta(table)
        if not meta:
            return
        live = {os.path.basename(p) for p in meta["paths"]}
        live |= {os.path.basename(p) for p in meta.get("prev_paths", [])}
        d = self._table_dir(table)
        for v in sorted(v for v in os.listdir(d) if v.startswith("v_")):
            if v not in live:
                shutil.rmtree(os.path.join(d, v), ignore_errors=True)

    def vacuum(self, table: str) -> None:
        """Explicit maintenance purge: delete every version dir not in the
        CURRENT snapshot.  Call only when no reader holds plans against an
        older snapshot (Delta ``VACUUM ... RETAIN 0 HOURS`` analog)."""
        meta = self._current_meta(table)
        if not meta:
            return
        live = {os.path.basename(p) for p in meta["paths"]}
        d = self._table_dir(table)
        for v in sorted(v for v in os.listdir(d) if v.startswith("v_")):
            if v not in live:
                shutil.rmtree(os.path.join(d, v), ignore_errors=True)
