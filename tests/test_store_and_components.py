"""ParquetTableStore unit tests (atomicity contract) + connected
components clustering."""

import json
import os

import pytest

from dlt_spark.store.table_store import ParquetTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetTableStore(spark, str(tmp_path), "ds")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_append_and_read(spark, store):
    store.append(_df(spark, [(1, "a")]), "t")
    store.append(_df(spark, [(2, "b")]), "t")
    assert store.read("t").count() == 2
    assert store.list_tables() == ["t"]


def test_overwrite_replaces_snapshot(spark, store):
    store.append(_df(spark, [(1, "a"), (2, "b")]), "t")
    store.overwrite(_df(spark, [(9, "z")]), "t")
    rows = store.read("t").collect()
    assert len(rows) == 1 and rows[0]["id"] == 9


def test_read_while_overwrite_snapshot_isolation(spark, store):
    store.append(_df(spark, [(1, "a")]), "t")
    old = store.read("t")  # plan bound to snapshot v0
    store.overwrite(_df(spark, [(2, "b")]), "t")
    # old plan still readable (vacuum keeps the previous version)
    assert old.count() == 1
    assert store.read("t").collect()[0]["id"] == 2


def test_truncate_and_drop(spark, store):
    store.append(_df(spark, [(1, "a")]), "t")
    store.truncate("t")
    assert not store.exists("t")
    store.append(_df(spark, [(2, "b")]), "t")
    store.drop("t")
    assert store.list_tables() == []


def test_vacuum_protects_full_previous_snapshot(spark, store, tmp_path):
    """A snapshot spanning several append dirs must survive the next
    overwrite in full — lazy plans bound to it are evaluated afterwards
    (load.py write_chain evaluates child plans post root-overwrite)."""
    for i in range(4):  # snapshot = 4 version dirs
        store.append(_df(spark, [(i, "x")]), "t")
    old = store.read("t")  # lazy plan over v0..v3
    store.overwrite(_df(spark, [(99, "z")]), "t")
    assert old.count() == 4  # every pre-overwrite dir still readable
    tdir = os.path.join(str(tmp_path), "ds", "t")
    dirs = sorted(d for d in os.listdir(tdir) if d.startswith("v_"))
    assert len(dirs) == 5  # v0..v3 (protected) + v4 (current)
    # a second overwrite drops the old generation, keeps the last two
    store.overwrite(_df(spark, [(100, "w")]), "t")
    dirs = sorted(d for d in os.listdir(tdir) if d.startswith("v_"))
    assert dirs == ["v_00000004", "v_00000005"]
    # explicit maintenance purge keeps only the current snapshot
    store.vacuum("t")
    dirs = sorted(d for d in os.listdir(tdir) if d.startswith("v_"))
    assert dirs == ["v_00000005"]


def test_truncate_preserves_partitioning(spark, store, tmp_path):
    store.append(_df(spark, [(1, "a"), (2, "b")]), "t", partition_by=["v"])
    store.truncate("t")
    store.append(_df(spark, [(3, "c")]), "t")
    with open(os.path.join(str(tmp_path), "ds", "t", "_current")) as f:
        meta = json.load(f)
    assert meta["partition_by"] == ["v"]
    # hive layout actually produced
    assert any("v=c" in str(p) for p in os.listdir(meta["paths"][0]))


def test_pointer_is_valid_json(spark, store, tmp_path):
    store.append(_df(spark, [(1, "a")]), "t")
    with open(os.path.join(str(tmp_path), "ds", "t", "_current")) as f:
        meta = json.load(f)
    assert meta["version"] == 0 and len(meta["paths"]) == 1


def test_connected_components(spark):
    from dlt_spark.dataops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out[1] == out[2] == out[3] == out[4] == 1
    assert out[5] == out[6] == 5
    assert out[8] == out[9] == out[10] == 8


def test_minhash_then_cluster(spark):
    from dlt_spark.dataops.dedup import connected_components, minhash_lsh_candidates

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "the quick brown fox jumps over the lazy dog again and once more"),
            (4, "completely unrelated text about database engines and queries"),
        ],
        "doc_id long, text string",
    )
    cand = minhash_lsh_candidates(docs, "doc_id", num_hashes=32, bands=16, shingle_n=2)
    clusters = {r["id"]: r["component"] for r in connected_components(cand, "id_a", "id_b").collect()}
    assert clusters.get(1) == clusters.get(2) == 1
    assert 4 not in clusters  # no candidate pair touched it


def test_connected_components_long_chain(spark):
    """Path halving: a 100-node chain (diameter 99) must converge inside
    the default 20-iteration cap — neighbor-min alone would need ~99."""
    from dlt_spark.dataops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    out = connected_components(pairs).collect()
    assert len(out) == 100
    assert {r["component"] for r in out} == {0}


def test_manifest_file_skipping(spark, tmp_path):
    """Delta-style data skipping on plain parquet: the sort hint writes a
    per-version min/max manifest; ranged reads open only overlapping
    files (VERDICT r3 #7)."""
    from dlt_spark.store.table_store import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path), "ds")
    df = (
        spark.range(0, 10_000)
        .withColumnRenamed("id", "ts")
        .repartitionByRange(8, "ts")   # 8 files with disjoint ts ranges
    )
    store.append(df, "events", sort_by=["ts"])

    total, after = store.skipped_files("events", [("ts", 9_000, None)])
    assert total == 8 and after < total  # files actually skipped

    got = store.read("events", where=[("ts", 9_000, None)]).filter("ts >= 9000")
    assert got.count() == 1_000
    # pruning must never lose rows vs the full scan
    full = store.read("events").filter("ts >= 9000")
    assert got.count() == full.count()

    # second append extends the manifest history; pruning spans versions
    df2 = (
        spark.range(20_000, 21_000)
        .withColumnRenamed("id", "ts")
        .repartitionByRange(2, "ts")
    )
    store.append(df2, "events")
    total2, after2 = store.skipped_files("events", [("ts", 20_500, None)])
    assert total2 == 10 and after2 <= 2
    assert store.read("events", where=[("ts", 20_500, None)]).filter("ts >= 20500").count() == 500

    # an empty overlap returns an empty, schema-stable frame
    none = store.read("events", where=[("ts", 50_000, None)])
    assert none.count() == 0 and "ts" in none.columns


def test_manifest_skipping_via_pipeline_sort_hint(spark, tmp_path):
    """End-to-end: a resource with a sort hint produces a store manifest
    and ranged reads skip files."""
    import dlt_spark

    pipe = dlt_spark.pipeline("skiptest", str(tmp_path / "d"), "ds", spark)
    rows = [{"id": i, "ts": i} for i in range(2_000)]
    pipe.run(rows, table_name="t", columns={"ts": {"name": "ts", "sort": True}})
    store = pipe.store
    meta = store._current_meta("t")
    assert meta and meta.get("sort_by") == ["ts"]
    total, after = store.skipped_files("t", [("ts", 1_999, None)])
    assert after <= total  # manifest present and consulted
    got = store.read("t", where=[("ts", 1_999, None)]).filter("ts = 1999")
    assert got.count() == 1


def test_time_travel_read_across_appends(spark, store):
    store.append(_df(spark, [(1, "a")]), "tt")
    store.append(_df(spark, [(2, "b")]), "tt")
    store.append(_df(spark, [(3, "c")]), "tt")
    assert store.read("tt", version=0).count() == 1
    assert store.read("tt", version=1).count() == 2
    assert store.read("tt", version=2).count() == 3
    assert {r["id"] for r in store.read("tt", version=1).collect()} == {1, 2}
    with pytest.raises(FileNotFoundError):
        store.read("tt", version=9)


def test_history_records_ops_and_readability(spark, store):
    store.append(_df(spark, [(1, "a")]), "h")
    store.append(_df(spark, [(2, "b")]), "h")
    store.overwrite(_df(spark, [(9, "z")]), "h")
    hist = store.history("h")
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["op"] for h in hist] == ["append", "append", "overwrite"]
    # overwrite auto-vacuums to current+previous: v0's dir is shared with
    # v1's snapshot (append chains reference prior dirs), so all readable
    assert hist[2]["readable"]
    # explicit vacuum prunes history readability to the current snapshot
    store.vacuum("h")
    hist = store.history("h")
    assert hist[2]["readable"]
    assert not hist[0]["readable"]
    with pytest.raises(FileNotFoundError):
        store.read("h", version=0)


def test_changes_append_fast_path_and_diff(spark, store):
    store.append(_df(spark, [(1, "a"), (2, "b")]), "cd")
    store.append(_df(spark, [(3, "c")]), "cd")
    ch = store.changes("cd", 0, 1)
    rows = {(r["id"], r["_change_type"]) for r in ch.collect()}
    assert rows == {(3, "insert")}
    # overwrite path: full multiset diff with deletes
    store.overwrite(_df(spark, [(2, "b"), (4, "d")]), "cd")
    ch = store.changes("cd", 1, 2)
    rows = {(r["id"], r["_change_type"]) for r in ch.collect()}
    assert rows == {(4, "insert"), (1, "delete"), (3, "delete")}


def test_dataset_table_version_param(spark, tmp_path):
    from dlt_spark.dataset.dataset import Dataset

    store = ParquetTableStore(spark, str(tmp_path), "ds2")
    store.append(_df(spark, [(1, "a")]), "t")
    store.append(_df(spark, [(2, "b")]), "t")
    ds = Dataset(spark, store)
    assert len(ds.table("t").df()) == 2
    assert len(ds.table("t", version=0).df()) == 1


def test_manifest_stats_with_nested_column_before_sort_column(spark, tmp_path):
    """Row-group stats are flattened leaves: a struct column ahead of the
    sort column must not shift which leaf's min/max the manifest records
    (regression: field-index lookup read the wrong leaf)."""
    from pyspark.sql import functions as F

    from dlt_spark.store.table_store import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path), "ds")
    df = (
        spark.range(0, 8_000)
        .select(
            F.struct(
                F.lit("zzz").alias("a"), (F.col("id") % 3).cast("string").alias("b")
            ).alias("props"),
            F.col("id").alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    store.append(df, "events", sort_by=["ts"])
    total, after = store.skipped_files("events", [("ts", 7_000, None)])
    assert total == 8 and after < total
    # pruning with correct stats must keep every matching row
    got = store.read("events", where=[("ts", 7_000, None)]).filter("ts >= 7000")
    assert got.count() == 1_000


def test_read_empty_version_of_fully_truncated_table(spark, tmp_path):
    """read(version=truncated) when the CURRENT snapshot is also empty
    must return an empty frame with the original schema (regression:
    spark.read.parquet() with zero paths raised)."""
    from dlt_spark.store.table_store import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path), "ds")
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    store.append(df, "t")          # v0: data
    store.truncate("t")            # v1: empty, now current
    out = store.read("t", version=1)
    assert out.count() == 0
    assert set(out.columns) == {"id", "name"}


def test_zorder_all_null_column_is_constant_not_crash(spark):
    from dlt_spark.store.zorder import column_ranges, zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(i), None) for i in range(10)], "x double, y double"
    )
    ranges = column_ranges(df, ["x", "y"])
    assert ranges["y"] == (None, None)
    out = df.withColumn("z", zorder_key(ranges)).collect()
    assert len(out) == 10 and all(r["z"] is not None for r in out)


def test_dataset_optimize_compacts_and_zorders(spark, tmp_path):
    """Dataset.optimize: append-generation folding, zorder rewrite with
    manifest skipping on both clustered columns, vacuum of old dirs."""
    import os

    import dlt_spark
    from pyspark.sql import functions as F

    pipe = dlt_spark.pipeline("opt", str(tmp_path / "opt"), "ds", spark)
    for batch in range(4):
        rows = [{"a": batch * 25 + i, "b": (i * 7) % 100, "v": i} for i in range(25)]
        pipe.run(rows, table_name="t")
    ds = pipe.dataset()
    assert ds["t"].row_count() == 100

    # compaction folds the four append dirs
    ds.optimize("t", num_files=2)
    assert ds["t"].row_count() == 100

    # zorder rewrite enables file skipping on BOTH columns
    ds.optimize("t", zorder_by=["a", "b"], num_files=8)
    assert ds["t"].row_count() == 100
    total_a, after_a = pipe.store.skipped_files("t", [("a", 90, None)])
    total_b, after_b = pipe.store.skipped_files("t", [("b", 90, None)])
    assert total_a == total_b == 8
    assert after_a < total_a and after_b < total_b  # both dims prune


def test_max_rows_per_file_rotation(spark, tmp_path):
    """The reference buffered writer's file-rotation dial
    (file_max_items) maps onto Spark's maxRecordsPerFile: a bounded
    store splits a single-partition write into ceil(rows/limit) files."""
    import glob
    import os

    from dlt_spark.store.table_store import ParquetTableStore

    df = spark.createDataFrame([(i,) for i in range(100)], "id long").coalesce(1)

    plain = ParquetTableStore(spark, str(tmp_path / "a"), "ds")
    plain.append(df, "t")
    rotated = ParquetTableStore(
        spark, str(tmp_path / "b"), "ds", max_rows_per_file=30
    )
    rotated.append(df, "t")

    def files(root):
        return [
            f for f in glob.glob(os.path.join(root, "ds/t/v_*/*.parquet"))
            if not os.path.basename(f).startswith("_")
        ]

    assert len(files(str(tmp_path / "a"))) == 1
    assert len(files(str(tmp_path / "b"))) == 4  # ceil(100 / 30)
    assert rotated.read("t").count() == 100
