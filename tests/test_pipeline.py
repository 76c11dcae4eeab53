"""End-to-end pipeline tests — F3 merge_staging / F4 scd2 fixtures from
FIXTURES.md (model: reference tests/load/pipeline/test_merge_disposition.py,
test_scd2.py)."""

import pytest

import dlt_spark


def _batch1():
    return [
        {"id": i, "mk": f"m{i % 2}", "updated_at": f"2024-01-01T00:00:0{i}",
         "deleted": False, "payload": f"p{i}",
         "items": [{"sku": f"s{i}", "qty": i}] * (2 if i == 3 else 1)}
        for i in range(1, 6)
    ]


def _batch2():
    rows = [
        {"id": i, "mk": f"m{i % 2}", "updated_at": f"2024-01-02T00:00:0{i % 10}",
         "deleted": i == 5, "payload": f"p{i}-v2",
         "items": [{"sku": f"s{i}b", "qty": i * 10}]}
        for i in range(3, 8)
    ]
    # id=4 duplicated with different updated_at; dedup_sort keeps latest
    rows.append({"id": 4, "mk": "m0", "updated_at": "2024-01-02T09:00:00",
                 "deleted": False, "payload": "p4-latest",
                 "items": [{"sku": "s4c", "qty": 400}]})
    return rows


@pytest.fixture()
def pipe(spark, tmp_path):
    return dlt_spark.pipeline(
        "test_pipe", destination=str(tmp_path / "dest"), dataset_name="ds",
        spark=spark,
    )


def _run_merge(pipe, batch, strategy="delete-insert"):
    return pipe.run(
        batch,
        table_name="orders",
        write_disposition="merge",
        merge_strategy=strategy,
        primary_key="id",
        columns={
            "updated_at": {"name": "updated_at", "dedup_sort": "desc"},
            "deleted": {"name": "deleted", "hard_delete": True},
        },
    )


def test_append_and_read(pipe):
    pipe.run(_batch1(), table_name="orders")
    ds = pipe.dataset()
    assert ds.table("orders").row_count() == 5
    items = ds.table("orders__items")
    assert items.row_count() == 6  # id=3 has 2 items
    # relation ops
    rel = ds["orders"].where("id", "gte", 3).order_by("id").select("id", "payload")
    assert [r[0] for r in rel.fetchall()] == [3, 4, 5]


def test_merge_delete_insert(pipe):
    _run_merge(pipe, _batch1())
    _run_merge(pipe, _batch2())
    ds = pipe.dataset()
    rows = {r["id"]: r for r in ds["orders"].spark_df().collect()}
    # ids 1,2 untouched; 3,4 replaced; 5 hard-deleted; 6,7 inserted
    assert set(rows) == {1, 2, 3, 4, 6, 7}
    assert rows[3]["payload"] == "p3-v2"
    assert rows[4]["payload"] == "p4-latest"  # dedup_sort kept latest
    # child rows of replaced roots removed: id=3 had 2 items, now 1
    items = ds["orders__items"].spark_df().collect()
    skus = sorted(i["sku"] for i in items)
    assert "s3" not in skus and "s3b" in skus
    assert "s4c" in skus and "s4b" not in skus  # deduped staging row's items only
    # idempotent replay (batch3 == batch2)
    _run_merge(pipe, _batch2())
    rows2 = {r["id"]: r for r in ds["orders"].spark_df().collect()}
    assert {k: v["payload"] for k, v in rows2.items()} == {
        k: v["payload"] for k, v in rows.items()
    }


def test_merge_upsert(pipe):
    _run_merge(pipe, _batch1(), strategy="upsert")
    _run_merge(pipe, _batch2(), strategy="upsert")
    rows = {r["id"]: r for r in pipe.dataset()["orders"].spark_df().collect()}
    assert set(rows) == {1, 2, 3, 4, 6, 7}
    assert rows[3]["payload"] == "p3-v2"


def test_merge_insert_only(pipe):
    _run_merge(pipe, _batch1(), strategy="insert-only")
    _run_merge(pipe, _batch2(), strategy="insert-only")
    rows = {r["id"]: r for r in pipe.dataset()["orders"].spark_df().collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    assert rows[3]["payload"] == "p3"  # existing ids untouched


def test_replace(pipe):
    pipe.run(_batch1(), table_name="orders", write_disposition="replace")
    pipe.run(_batch2()[:2], table_name="orders", write_disposition="replace")
    assert pipe.dataset()["orders"].row_count() == 2


def test_scd2(pipe):
    b1 = [{"nk": 1, "name": "a", "tier": "gold"}, {"nk": 2, "name": "b", "tier": "silver"}]
    b2 = [{"nk": 1, "name": "a", "tier": "platinum"}, {"nk": 3, "name": "c", "tier": "gold"},
          {"nk": 2, "name": "b", "tier": "silver"}]
    pipe.run(b1, table_name="dim", write_disposition="merge", merge_strategy="scd2",
             boundary_timestamp="2024-01-01 00:00:00")
    pipe.run(b2, table_name="dim", write_disposition="merge", merge_strategy="scd2",
             boundary_timestamp="2024-02-01 00:00:00")
    df = pipe.dataset()["dim"].spark_df()
    rows = df.collect()
    active = [r for r in rows if r["_dlt_valid_to"] is None]
    retired = [r for r in rows if r["_dlt_valid_to"] is not None]
    assert {(r["nk"], r["tier"]) for r in active} == {(1, "platinum"), (3, "gold"), (2, "silver")}
    assert {(r["nk"], r["tier"]) for r in retired} == {(1, "gold")}
    assert str(retired[0]["_dlt_valid_to"]).startswith("2024-02-01")
    # unchanged row 2 not re-inserted: valid_from still batch1 boundary
    row2 = [r for r in active if r["nk"] == 2][0]
    assert str(row2["_dlt_valid_from"]).startswith("2024-01-01")
    # B3: 2 absent -> retired (no merge_key -> full snapshot semantics)
    b3 = [{"nk": 1, "name": "a", "tier": "platinum"}, {"nk": 3, "name": "c", "tier": "gold"}]
    pipe.run(b3, table_name="dim", write_disposition="merge", merge_strategy="scd2",
             boundary_timestamp="2024-03-01 00:00:00")
    rows = pipe.dataset()["dim"].spark_df().collect()
    active_nks = {r["nk"] for r in rows if r["_dlt_valid_to"] is None}
    assert active_nks == {1, 3}


def test_loads_commit_and_row_counts(pipe):
    pipe.run(_batch1(), table_name="orders")
    ds = pipe.dataset()
    assert len(ds.load_ids()) == 1
    counts = dict(ds.row_counts().fetchall())
    assert counts["orders"] == 5
    assert counts["orders__items"] == 6


def test_state_restore_ignores_uncommitted(pipe):
    """A state row persisted without its _dlt_loads commit (crash between
    the two) must NOT advance the restored cursor — otherwise the
    uncommitted package's rows are never re-loaded."""
    from dlt_spark.pipeline.state import PipelineState

    pipe.run(_batch1(), table_name="orders")
    committed = PipelineState.restore(pipe.store, "test_pipe")
    assert committed is not None
    v_committed = committed.version
    # simulate the crash: state append for a load_id that never commits
    orphan = PipelineState("test_pipe")
    orphan.version = v_committed + 7
    orphan.state = {"sources": {"ds": {"poison": True}}}
    orphan.persist(pipe.spark, pipe.store, load_id="9999999999.0")
    restored = PipelineState.restore(pipe.store, "test_pipe")
    assert restored is not None
    assert restored.version == v_committed
    assert "poison" not in str(restored.state)


def test_incremental_cursor(pipe):
    inc = dlt_spark.incremental("updated_at", initial_value=None, primary_key=["id"])
    pipe.run(_batch1(), table_name="orders", incremental=inc)
    assert pipe.dataset()["orders"].row_count() == 5
    # second run with same data: everything <= cursor filtered out
    inc2 = dlt_spark.incremental("updated_at", initial_value=None, primary_key=["id"])
    pipe2 = dlt_spark.Pipeline(
        "test_pipe", str(pipe.store.root).rsplit("/ds", 1)[0], "ds", pipe.spark
    )
    pipe2.run(_batch1(), table_name="orders", incremental=inc2)
    assert pipe2.dataset()["orders"].row_count() == 5  # no duplicates


def test_scd2_merge_key_scopes_retirement(spark):
    """scd2 with merge_key (reference gen_scd2_sql merge-key branch):
    a partial snapshot retires vanished rows only within its own key
    values; rows under uncovered keys stay active."""
    from dlt_spark.load.dispositions import scd2_apply

    b1 = spark.createDataFrame(
        [(1, "us", "a"), (2, "us", "b"), (3, "eu", "c")],
        "id long, region string, val string",
    )
    dim = scd2_apply(None, b1, boundary_ts="2024-01-01 00:00:00")
    # partial: only region=us; id=2 vanished (retire), id=1 changed val
    b2 = spark.createDataFrame(
        [(1, "us", "a2")], "id long, region string, val string"
    )
    out = scd2_apply(
        dim, b2, boundary_ts="2024-02-01 00:00:00", merge_key=["region"]
    ).collect()
    by_id_val = {(r["id"], r["val"]): r for r in out}
    # id=2 (us, vanished) retired at the boundary
    assert str(by_id_val[(2, "b")]["_dlt_valid_to"]).startswith("2024-02-01")
    # id=3 (eu, absent but uncovered) stays active
    assert by_id_val[(3, "c")]["_dlt_valid_to"] is None
    # id=1 old version retired, new version active from the boundary
    assert str(by_id_val[(1, "a")]["_dlt_valid_to"]).startswith("2024-02-01")
    assert by_id_val[(1, "a2")]["_dlt_valid_to"] is None
    assert str(by_id_val[(1, "a2")]["_dlt_valid_from"]).startswith("2024-02-01")
