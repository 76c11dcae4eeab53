"""Default hints + preferred types by column-name regex (reference
Schema._infer_hint / preferred_types)."""

import pytest

import dlt_spark


def test_default_hints_applied(spark, tmp_path):
    pipe = dlt_spark.pipeline("h", str(tmp_path / "d"), "ds", spark)
    pipe.run([{"id": 1, "items": [1, 2]}], table_name="t")
    cols = pipe.schema.tables["t"]["columns"]
    assert cols["_dlt_id"].get("row_key") is True
    child_cols = pipe.schema.tables["t__items"]["columns"]
    assert child_cols["_dlt_parent_id"].get("parent_key") is True


def test_custom_default_hint(spark, tmp_path):
    pipe = dlt_spark.pipeline("h2", str(tmp_path / "d"), "ds", spark)
    pipe.schema.settings["default_hints"]["sort"] = [r"timestamp$"]
    pipe.run([{"id": 1, "event_timestamp": "x"}], table_name="t")
    assert pipe.schema.tables["t"]["columns"]["event_timestamp"].get("sort") is True


def test_preferred_types_cast(spark, tmp_path):
    pipe = dlt_spark.pipeline("h3", str(tmp_path / "d"), "ds", spark)
    pipe.schema.settings["preferred_types"] = {r"_count$": "bigint", r"^price": "decimal"}
    pipe.run([{"id": 1, "click_count": 3.0, "price_usd": 9.5}], table_name="t")
    df = pipe.dataset()["t"].spark_df()
    types = dict(df.dtypes)
    assert types["click_count"] == "bigint"
    assert types["price_usd"].startswith("decimal")


def test_sort_hint_clusters_written_files(spark, tmp_path):
    """The `sort` column hint orders rows inside written files so parquet
    row-group stats can prune scans (reference cluster/sort hint analog)."""
    import pyarrow.parquet as pq

    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    rows = [{"id": i, "ts": (i * 7919) % 1000} for i in range(2000)]
    res = DltResource(rows, name="sorted_t")
    res.apply_hints(columns={"ts": {"name": "ts", "sort": True}})
    pipe = dlt_spark.pipeline("sorthint", str(tmp_path / "d"), "ds", spark)
    pipe.run(res)
    files = [f for f in pipe.dataset()["sorted_t"].source_files() if f.endswith(".parquet")]
    assert files
    for f in files:
        ts = pq.read_table(f.replace("file:", ""), columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts)  # rows clustered within every file


def test_cluster_hint_gives_files_disjoint_ranges(spark, tmp_path):
    """The `cluster` column hint (reference typing.py cluster — the
    BigQuery/Snowflake clustering column) range-partitions the write so
    files carry DISJOINT value ranges: a point/range scan prunes to ~one
    file via the store manifest instead of overlapping every file."""
    import pyarrow.parquet as pq

    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    rows = [{"id": i, "ts": (i * 7919) % 1000} for i in range(2000)]
    res = DltResource(rows, name="clustered_t")
    res.apply_hints(columns={"ts": {"name": "ts", "cluster": True}})
    # AQE correctly coalesces 2000 rows into one range partition; the
    # rotation dial splits that sorted task output into sequential —
    # hence still range-disjoint — files, which is exactly how the two
    # dials compose at real scale too
    pipe = dlt_spark.pipeline(
        "clusterhint", str(tmp_path / "d"), "ds", spark, max_rows_per_file=500
    )
    pipe.run(res)
    files = [
        f for f in pipe.dataset()["clustered_t"].source_files()
        if f.endswith(".parquet")
    ]
    assert len(files) > 1  # range exchange produced multiple files
    ranges = []
    for f in files:
        ts = pq.read_table(f.replace("file:", ""), columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts)  # also sorted within each file
        ranges.append((min(ts), max(ts)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: pruning can hit exactly one file


def test_nested_hints_mark_child_table_keys(spark, tmp_path):
    """nested_hints (reference make_hints nested_hints): child tables
    get primary_key / column hints by nested path."""
    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    data = [
        {"id": 1, "Items": [{"sku": "a", "qty": 1}, {"sku": "b", "qty": 2}]},
    ]
    res = DltResource(
        data, name="orders", primary_key="id",
        nested_hints={"Items": {
            "primary_key": "sku",
            "columns": {"qty": {"name": "qty", "x_unit": "each"}},
        }},
    )
    pipe = dlt_spark.pipeline("nh", str(tmp_path / "nh"), "ds", spark)
    pipe.run(res)
    child = pipe.schema.tables["orders__items"]
    cols = {c["name"]: c for c in child["columns"]} if isinstance(child["columns"], list) else child["columns"]
    sku = cols["sku"] if isinstance(cols, dict) else None
    assert (sku or [c for c in child["columns"] if c["name"] == "sku"][0])["primary_key"] is True
    qty = cols["qty"] if isinstance(cols, dict) else [c for c in child["columns"] if c["name"] == "qty"][0]
    assert qty["x_unit"] == "each"


def test_declared_references_drive_join_derivation(spark, tmp_path):
    """make_hints(references=...): a declared FK wins over the shared-
    natural-key fallback when deriving a Relation join."""
    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    pipe = dlt_spark.pipeline("refs", str(tmp_path / "refs"), "ds", spark)
    pipe.run(DltResource([{"id": 10, "name": "acme"}], name="customers"))
    pipe.run(DltResource(
        [{"oid": 1, "cust": 10, "name": "o1"}, {"oid": 2, "cust": 99, "name": "o2"}],
        name="orders",
        references=[{
            "referenced_table": "customers",
            "columns": ["cust"],
            "referenced_columns": ["id"],
        }],
    ))
    assert pipe.schema.tables["orders"]["references"][0]["referenced_table"] == "customers"
    ds = pipe.dataset()
    # both tables share a 'name' column: without the declared reference
    # the fallback would wrongly join on it
    joined = ds["orders"].join(ds["customers"], kind="inner", alias="c")
    rows = joined.spark_df().collect()
    assert len(rows) == 1 and rows[0]["oid"] == 1


def test_zorder_hint_prunes_on_every_dimension(spark, tmp_path):
    """The `zorder` column hint interleaves bucket bits of ALL hinted
    columns, so each written file covers a small (x, y) box and a
    y-only range scan prunes files — under the lexicographic `cluster`
    hint every file spans the full y domain and nothing prunes."""
    import pyarrow.parquet as pq

    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    rows = [{"x": i // 64, "y": i % 64} for i in range(4096)]

    def boxes(pipe_name, hints, table):
        res = DltResource(list(rows), name=table)
        res.apply_hints(columns=hints)
        pipe = dlt_spark.pipeline(
            pipe_name, str(tmp_path / pipe_name), "ds", spark,
            max_rows_per_file=256,
        )
        pipe.run(res)
        out = []
        for f in pipe.dataset()[table].source_files():
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(f.replace("file:", ""), columns=["x", "y"])
            xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
            out.append((min(xs), max(xs), min(ys), max(ys)))
        return out

    zb = boxes(
        "zorderhint",
        {"x": {"name": "x", "zorder": True}, "y": {"name": "y", "zorder": True}},
        "zt",
    )
    cb = boxes(
        "lexhint",
        {"x": {"name": "x", "cluster": True}, "y": {"name": "y", "cluster": True}},
        "ct",
    )
    assert len(zb) > 4 and len(cb) > 4
    # a y-only range scan: y BETWEEN 10 AND 12
    z_hit = sum(1 for (_, _, lo, hi) in zb if lo <= 12 and hi >= 10)
    c_hit = sum(1 for (_, _, lo, hi) in cb if lo <= 12 and hi >= 10)
    assert c_hit == len(cb)          # lexicographic: every file overlaps
    assert z_hit <= len(zb) // 2     # z-order: most files pruned
    # and the x dimension still prunes too (no worse than ~a quadrant)
    zx_hit = sum(1 for (lo, hi, _, _) in zb if lo <= 12 and hi >= 10)
    assert zx_hit <= len(zb) // 2


def test_quantile_zorder_balances_skewed_dimension(spark, tmp_path):
    """Equal-width z-ranks collapse under skew (a power-law column packs
    most rows into one bucket, so that dimension stops pruning);
    quantile mode gives every bucket ~equal row mass, so per-file boxes
    stay balanced in ROW terms and a hot-range scan still prunes."""
    from pyspark.sql import functions as F

    from dlt_spark.store.zorder import zorder

    # y is uniform; x is power-law: 90% of rows in [0, 10), tail to 10000
    rows = []
    for i in range(4000):
        x = (i % 10) if i % 10 != 9 else (i * 37) % 10000
        rows.append((x, i % 64))
    df = spark.createDataFrame(rows, "x long, y long")

    def hot_file_fraction(mode):
        out = zorder(df, ["x", "y"], num_files=16, mode=mode)
        parts = out.withColumn("_pid", F.spark_partition_id())
        stats = parts.groupBy("_pid").agg(
            F.min("x").alias("xlo"), F.max("x").alias("xhi"),
            F.count("*").alias("n"),
        ).collect()
        # a scan for the HOT range x < 10 (90% of rows): fraction of
        # ROWS inside files whose x-box overlaps it that are wasted
        # reads is what pruning quality means under skew; proxy: how
        # many files carry a tail-polluted box (xhi far from xlo)
        return sum(1 for r in stats if r["xlo"] < 10 and r["xhi"] >= 1000), len(stats)

    wide_bad, wide_n = hot_file_fraction("width")
    q_bad, q_n = hot_file_fraction("quantile")
    # quantile mode must strictly reduce tail-polluted hot files
    assert q_bad < wide_bad, (q_bad, wide_bad, q_n, wide_n)
