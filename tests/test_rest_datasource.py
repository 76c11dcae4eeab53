"""Distributed REST source (Spark 4 Python Data Source API): page
ranges fetched on executors, planning-time total probing, offset and
page-number partitioning, sequential fallback."""

import json

import pytest
from pyspark.sql import functions as F

from dlt_spark.sources.demo_transport import PAGE_SIZE, TOTAL
from dlt_spark.sources.rest_datasource import RestDataSource

TRANSPORT = "dlt_spark.sources.demo_transport:make_session"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(RestDataSource)


def _read_users(spark, **extra):
    opts = {
        "base_url": "https://api.example.com",
        "path": "users",
        "schema_ddl": "id long, name string, page long",
        "data_selector": "users",
        "transport": TRANSPORT,
        "paginator": json.dumps(
            {"type": "page_number", "total_path": "total_pages"}
        ),
        "probe_total": "true",
        "pages_per_partition": "3",
    }
    opts.update(extra)
    return spark.read.format("dlt_rest").options(**opts).load()


def test_page_number_partitioned_fetch_is_complete(spark):
    df = _read_users(spark)
    assert df.count() == TOTAL
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == list(range(TOTAL))
    assert {r["name"] for r in rows if r["id"] == 7} == {"user_7"}


def test_pages_fetched_by_multiple_partitions(spark):
    df = _read_users(spark).withColumn("part", F.spark_partition_id())
    parts = df.select("part").distinct().count()
    # 10 pages / 3 per partition -> 4 partitions
    assert parts == 4
    # each page fetched exactly once: per-page counts match the API
    per_page = {r["page"]: r["n"] for r in df.groupBy("page").agg(F.count("*").alias("n")).collect()}
    assert per_page[1] == PAGE_SIZE
    assert per_page[10] == TOTAL - 9 * PAGE_SIZE


def test_offset_paginator_with_known_total(spark):
    df = (
        spark.read.format("dlt_rest")
        .options(
            base_url="https://api.example.com",
            path="items",
            schema_ddl="id long",
            data_selector="items",
            transport=TRANSPORT,
            paginator=json.dumps({"type": "offset", "limit": 40, "total_pages": 6}),
            pages_per_partition="2",
        )
        .load()
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(TOTAL))


def test_offset_probe_total(spark):
    df = (
        spark.read.format("dlt_rest")
        .options(
            base_url="https://api.example.com",
            path="items",
            schema_ddl="id long",
            data_selector="items",
            transport=TRANSPORT,
            paginator=json.dumps({"type": "offset", "limit": 50, "total_path": "total"}),
            probe_total="true",
            pages_per_partition="1",
        )
        .load()
    )
    assert df.count() == TOTAL


def test_sequential_fallback_without_total(spark):
    # no total and no probe: one partition, still complete (stops on the
    # first short page)
    df = _read_users(spark, probe_total="false", paginator=json.dumps({"type": "page_number"}))
    assert df.withColumn("p", F.spark_partition_id()).select("p").distinct().count() == 1
    assert df.count() == TOTAL


def test_streaming_incremental_page_polling(spark, tmp_path):
    """readStream over the REST source: each micro-batch polls new pages;
    growth between batches arrives exactly once (append-only page space)."""
    from dlt_spark.sources import demo_transport as dt

    dt.set_feed_total(2 * dt.PAGE_SIZE)  # two full pages to start
    seen = []

    q = (
        spark.readStream.format("dlt_rest")
        .options(
            base_url="https://api.example.com",
            path="feed",
            schema_ddl="id long, kind string",
            data_selector="events",
            transport=TRANSPORT,
            paginator=json.dumps({"type": "page_number"}),
            pages_per_batch="5",
        )
        .load()
        .writeStream.foreachBatch(lambda df, _id: seen.extend(r["id"] for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(seen) == list(range(2 * dt.PAGE_SIZE))
        dt.set_feed_total(4 * dt.PAGE_SIZE)  # two more pages appear
        q.processAllAvailable()
        assert sorted(seen) == list(range(4 * dt.PAGE_SIZE))
        assert len(seen) == len(set(seen))  # exactly once
    finally:
        q.stop()
        dt.set_feed_total(0)


def test_streaming_rest_to_store_exactly_once(spark, tmp_path):
    """Full streaming ELT: readStream dlt_rest -> StreamingPipeline sink
    -> versioned store, across source growth — every event loaded once,
    each micro-batch an atomic _dlt_loads commit."""
    import dlt_spark
    from dlt_spark.sources import demo_transport as dt
    from dlt_spark.streaming import StreamingPipeline

    dt.set_feed_total(2 * dt.PAGE_SIZE)
    pipe = dlt_spark.pipeline("restst", str(tmp_path / "dest"), "ds", spark)
    sp = StreamingPipeline(pipe, str(tmp_path / "cp"))
    stream = (
        spark.readStream.format("dlt_rest")
        .options(
            base_url="https://api.example.com",
            path="feed",
            schema_ddl="id long, kind string",
            data_selector="events",
            transport=TRANSPORT,
            paginator=json.dumps({"type": "page_number"}),
            pages_per_batch="5",
        )
        .load()
    )
    try:
        # drain 1 (availableNow trigger: terminates when caught up)
        q = sp.write_stream(stream, "feed_events", write_disposition="append")
        q.awaitTermination(120)
        assert pipe.dataset()["feed_events"].row_count() == 2 * dt.PAGE_SIZE
        # source grows; restart from the SAME checkpoint — the stream
        # resumes at its committed page offset
        dt.set_feed_total(4 * dt.PAGE_SIZE)
        q2 = sp.write_stream(stream, "feed_events", write_disposition="append")
        q2.awaitTermination(120)
        rel = pipe.dataset()["feed_events"]
        assert rel.row_count() == 4 * dt.PAGE_SIZE
        ids = [r["id"] for r in rel.select("id").spark_df().collect()]
        assert sorted(ids) == list(range(4 * dt.PAGE_SIZE))  # exactly once
        assert len(pipe.dataset().load_ids()) >= 2  # one commit per batch
    finally:
        dt.set_feed_total(0)


def test_streaming_non_page_aligned_growth(spark, tmp_path):
    """The exactly-once gap flagged in round 3: a partially-filled tail
    page that later fills up.  With page_size set, the reader re-polls
    the partial page and emits only the unseen rows."""
    from dlt_spark.sources import demo_transport as dt

    dt.set_feed_total(dt.PAGE_SIZE + 7)  # one full page + 7-item partial tail
    seen = []

    q = (
        spark.readStream.format("dlt_rest")
        .options(
            base_url="https://api.example.com",
            path="feed",
            schema_ddl="id long, kind string",
            data_selector="events",
            transport=TRANSPORT,
            paginator=json.dumps({"type": "page_number"}),
            pages_per_batch="5",
            page_size=str(dt.PAGE_SIZE),
        )
        .load()
        .writeStream.foreachBatch(lambda df, _id: seen.extend(r["id"] for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(seen) == list(range(dt.PAGE_SIZE + 7))
        # the partial page fills up AND a new partial page appears
        dt.set_feed_total(2 * dt.PAGE_SIZE + 3)
        q.processAllAvailable()
        assert sorted(seen) == list(range(2 * dt.PAGE_SIZE + 3))
        assert len(seen) == len(set(seen))  # exactly once, no loss
        # grow once more within the same tail page
        dt.set_feed_total(2 * dt.PAGE_SIZE + 9)
        q.processAllAvailable()
        assert sorted(seen) == list(range(2 * dt.PAGE_SIZE + 9))
        assert len(seen) == len(set(seen))
    finally:
        q.stop()
        dt.set_feed_total(0)
