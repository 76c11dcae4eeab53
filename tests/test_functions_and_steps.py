"""Scalar function layer (§2.I) + pipe steps (metrics/validation/maps) +
custom destination tests."""

import pytest
from pyspark.sql import functions as F

import dlt_spark
from dlt_spark import functions as fn
from dlt_spark.pipeline.resources import DltResource


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _scalar(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_text_to_binary(one):
    assert _scalar(one, fn.text_to_binary(F.lit("0xdeadbeef"))) == bytes.fromhex("deadbeef")
    assert _scalar(one, fn.text_to_binary(F.lit("YmluYXJ5IGRhdGE="))) == b"binary data"
    assert _scalar(one, fn.binary_to_text(F.lit(b"binary data"))) == "YmluYXJ5IGRhdGE="


def test_text_to_bigint(one):
    assert _scalar(one, fn.text_to_bigint(F.lit("0xff"))) == 255
    assert _scalar(one, fn.text_to_bigint(F.lit(" 42 "))) == 42
    assert _scalar(one, fn.text_to_bigint(F.lit("nope"))) is None


def test_bigint_to_binary_le(spark):
    # oracle: int.to_bytes(..., "little") — the reference's exact recipe
    values = [0, 1, 255, 256, 2**16, 2**31 - 1, 2**40 + 7, 2**62, -5]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = {
        r["v"]: r["b"]
        for r in df.select("v", fn.bigint_to_binary_le(F.col("v")).alias("b")).collect()
    }
    for v in values:
        if v < 0:
            assert got[v] is None
        else:
            assert got[v] == v.to_bytes((v.bit_length() + 7) // 8, "little"), v


def test_str2bool(one):
    assert _scalar(one, fn.str2bool(F.lit("True"))) is True
    assert _scalar(one, fn.str2bool(F.lit("0"))) is False
    assert _scalar(one, fn.str2bool(F.lit("maybe"))) is None


def test_epoch_roundtrip(one):
    ts = fn.timestamp_from_epoch(F.lit(1653312405), "s")
    assert _scalar(one, fn.epoch_from_timestamp(ts, "s")) == 1653312405
    assert _scalar(one, fn.epoch_from_timestamp(fn.timestamp_from_epoch(F.lit(1653312405123), "ms"), "ms")) == 1653312405123


def test_time_type_roundtrip(one):
    micros = fn.time_to_micros(F.lit("13:26:45.176451"))
    assert _scalar(one, micros) == (13 * 3600 + 26 * 60 + 45) * 1_000_000 + 176451
    assert _scalar(one, fn.micros_to_time(micros)) == "13:26:45.176451"


def test_json_field(one):
    assert _scalar(one, fn.json_field(F.lit('{"a": {"b": 7}}'), "a.b")) == "7"


def test_digest128_deterministic(one):
    a = _scalar(one, fn.digest128(F.lit("x"), F.lit(1)))
    b = _scalar(one, fn.digest128(F.lit("x"), F.lit(1)))
    assert a == b and len(a) == 32


# ------------------------------------------------------------- pipe steps

def test_map_filter_yield_limit(spark):
    res = (
        DltResource([{"v": i} for i in range(10)], name="t")
        .add_map(lambda x: {"v": x["v"] * 2})
        .add_filter(lambda x: x["v"] >= 4)
        .add_yield_map(lambda x: [x, {"v": x["v"] + 1}])
        .add_limit(5)
    )
    out = res.materialize(spark)["t"]
    assert out.count() == 5
    vals = sorted(r["v"] for r in out.collect())
    assert vals[0] == 4


def test_metrics_observe(spark, tmp_path):
    from pyspark.sql import functions as SF

    res = DltResource([{"v": i} for i in range(5)], name="m").add_metrics(
        "m_stats", SF.count(SF.lit(1)).alias("n"), SF.sum("v").alias("total")
    )
    df = res.materialize(spark)["m"]
    df.collect()
    # Observation metrics are attached to the DataFrame execution


def test_validation_discard_row(spark):
    res = DltResource(
        [{"v": "1"}, {"v": "x"}, {"v": "3"}], name="vld"
    ).add_validation({"v": "bigint"}, mode="discard_row")
    out = res.materialize(spark)["vld"]
    assert sorted(r["v"] for r in out.collect()) == [1, 3]


def test_validation_freeze_missing_column(spark):
    res = DltResource([{"v": 1}], name="vld2").add_validation({"nope": "bigint"}, mode="freeze")
    with pytest.raises(ValueError):
        res.materialize(spark)


def test_dynamic_table_routing(spark):
    res = DltResource(
        [{"kind": "a", "v": 1}, {"kind": "b", "v": 2}, {"kind": "a", "v": 3}],
        name="r",
        table_name=lambda item: f"t_{item['kind']}",
    )
    tables = res.materialize(spark)
    assert set(tables) == {"t_a", "t_b"}
    assert tables["t_a"].count() == 2


def test_with_table_name_marker(spark):
    from dlt_spark import mark

    res = DltResource(
        [mark.with_table_name({"v": 1}, "left"), mark.with_table_name({"v": 2}, "right")],
        name="r",
    )
    tables = res.materialize(spark)
    assert set(tables) == {"left", "right"}


def test_transformer_composition(spark):
    from dlt_spark import transformer
    from dlt_spark.pipeline.resources import DltResource

    parent = DltResource([{"id": 1}, {"id": 2}], name="p")
    child = transformer(name="doubled")(lambda item: [{"id": item["id"], "x": item["id"] * 2}])
    res = parent | child
    out = res.materialize(spark)["doubled"]
    assert sorted(r["x"] for r in out.collect()) == [2, 4]


# ----------------------------------------------------- custom destination

def test_custom_destination(spark, tmp_path):
    sink_file = tmp_path / "sink.txt"

    @dlt_spark.destination(batch_size=2)
    def my_sink(batch, table):
        # executor-side: append row count to a shared file (local[4] = same fs)
        with open(sink_file, "a") as f:
            f.write(f"{len(batch)}\n")

    df = spark.createDataFrame([(i,) for i in range(5)], "v long").coalesce(1)
    my_sink.write(df, {"name": "t"})
    batches = [int(x) for x in sink_file.read_text().split()]
    assert sum(batches) == 5
    assert max(batches) <= 2


# --------------------------------------------------------- apply_hints

def test_apply_hints_set_and_remove():
    from dlt_spark.pipeline.resources import DltResource
    from dlt_spark.incremental import Incremental

    r = DltResource(data=[], name="t")
    out = r.apply_hints(
        table_name="renamed",
        write_disposition="merge",
        primary_key="id",
        merge_key=["a", "b"],
        incremental=Incremental(cursor_path="ts"),
        merge_strategy="upsert",
    )
    assert out is r  # chaining
    assert r.table_name == "renamed"
    assert r.write_disposition == "merge"
    assert r.primary_key == ["id"]
    assert r.merge_key == ["a", "b"]
    assert r.incremental.cursor_path == "ts"
    assert r.merge_strategy == "upsert"

    # None leaves hints untouched; empty values remove them
    r.apply_hints(write_disposition=None)
    assert r.write_disposition == "merge"
    r.apply_hints(table_name="", write_disposition="", primary_key=[], merge_key=[])
    assert r.table_name == "t"
    assert r.write_disposition == "append"
    assert r.primary_key is None and r.merge_key is None


def test_with_hints_routes_and_overrides_disposition(spark, tmp_path):
    """`mark.with_hints` items: route to the hinted table and load it
    with the hinted write_disposition/primary_key (reference
    dlt.mark.with_hints + make_hints)."""
    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource, mark

    def gen():
        yield {"id": 1, "v": "a"}
        yield mark.with_hints(
            {"pk": 1, "v": "x"},
            mark.make_hints(
                table_name="keyed", write_disposition="merge",
                merge_strategy="upsert", primary_key="pk",
            ),
        )
        yield mark.with_hints(
            {"pk": 1, "v": "y"},  # same pk -> upsert overwrites
            mark.make_hints(
                table_name="keyed", write_disposition="merge",
                merge_strategy="upsert", primary_key="pk",
            ),
        )

    pipe = dlt_spark.pipeline("wh", str(tmp_path / "wh"), "ds", spark)
    pipe.run(DltResource(gen, name="base"))
    base = pipe.dataset()["base"].spark_df().collect()
    assert [r["id"] for r in base] == [1]
    keyed = pipe.dataset()["keyed"].spark_df().collect()
    assert len(keyed) == 1 and keyed[0]["v"] == "y"  # upsert by pk
    # schema recorded the hinted disposition
    assert pipe.schema.tables["keyed"]["write_disposition"] == "merge"


def test_defer_resolves_concurrently_in_order(spark, tmp_path):
    import threading
    import time as _time

    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    seen = []

    @dlt_spark.defer
    def fetch(i):
        _time.sleep(0.2)
        seen.append(threading.current_thread().name)
        return {"i": i}

    def gen():
        for i in range(8):
            yield fetch(i)

    t0 = _time.time()
    pipe = dlt_spark.pipeline("dfr", str(tmp_path / "dfr"), "ds", spark)
    pipe.run(DltResource(gen, name="t"))
    wall = _time.time() - t0
    rows = sorted(r["i"] for r in pipe.dataset()["t"].spark_df().collect())
    assert rows == list(range(8))
    assert len({n for n in seen}) > 1  # actually ran on multiple threads


def test_current_state_roundtrips(spark, tmp_path):
    import dlt_spark
    from dlt_spark.pipeline.resources import DltResource

    def gen():
        st = dlt_spark.state()
        st["cursor"] = st.get("cursor", 0) + 10
        yield {"v": st["cursor"]}

    pipe = dlt_spark.pipeline("cur", str(tmp_path / "cur"), "ds", spark)
    pipe.run(DltResource(gen, name="t"))
    pipe.run(DltResource(gen, name="t"))
    vals = sorted(r["v"] for r in pipe.dataset()["t"].spark_df().collect())
    assert vals == [10, 20]  # state persisted and re-read across runs
    import pytest

    with pytest.raises(RuntimeError):
        dlt_spark.current.pipeline()
