"""Streaming tests: micro-batch cursor loop (reference semantics) and
Structured Streaming wrappers (watermark dedup, windows, sessions,
foreachBatch loader)."""

import time

import pytest
from pyspark.sql import functions as F

import dlt_spark
from dlt_spark.streaming import (
    StreamingPipeline,
    run_incremental_batches,
    sessionize_stream,
    watermark_dedup,
    windowed_counts,
)


def test_micro_batch_cursor_loop(spark, tmp_path):
    pipe = dlt_spark.pipeline("mb", str(tmp_path / "d"), "ds", spark)
    inc = dlt_spark.incremental("seq", initial_value=0, primary_key=["id"])
    b1 = [{"id": 1, "seq": 1}, {"id": 2, "seq": 2}]
    b2 = [{"id": 2, "seq": 2}, {"id": 3, "seq": 3}]  # overlap replayed
    infos = run_incremental_batches(pipe, [b1, b2], "clicks", inc)
    assert len(infos) == 2
    rows = sorted(r["id"] for r in pipe.dataset()["clicks"].spark_df().collect())
    assert rows == [1, 2, 3]  # overlap row not duplicated


@pytest.fixture()
def stream_input(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "u1"),
            (1, "2024-01-01 10:00:00", "u1"),  # dup
            (2, "2024-01-01 10:05:00", "u1"),
            (3, "2024-01-01 11:00:00", "u1"),
            (4, "2024-01-01 10:01:00", "u2"),
        ],
        "id long, ts string, user string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(src / "batch0"))
    return spark.readStream.schema("id long, ts timestamp, user string").parquet(
        str(src / "*")
    )


def _run_available_now(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup_t" else "complete")
        .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return q


def test_watermark_dedup_stream(spark, tmp_path, stream_input):
    deduped = watermark_dedup(stream_input, "ts", ["id"], delay="2 hours")
    _run_available_now(deduped, tmp_path, "dedup_t")
    out = spark.sql("SELECT * FROM dedup_t").collect()
    assert len(out) == 4  # one dup dropped


def test_windowed_counts_stream(spark, tmp_path, stream_input):
    counts = windowed_counts(stream_input, "ts", "30 minutes", group_cols=["user"])
    _run_available_now(counts, tmp_path, "win_t")
    rows = {(str(r["window_start"]), r["user"]): r["n"] for r in spark.sql("SELECT * FROM win_t").collect()}
    assert rows[("2024-01-01 10:00:00", "u1")] == 3  # incl dup
    assert rows[("2024-01-01 11:00:00", "u1")] == 1


def test_sessionize_stream(spark, tmp_path, stream_input):
    sess = sessionize_stream(stream_input, "ts", gap="30 minutes", group_cols=["user"])
    _run_available_now(sess, tmp_path, "sess_t")
    rows = spark.sql("SELECT * FROM sess_t ORDER BY user, session_start").collect()
    u1 = [r for r in rows if r["user"] == "u1"]
    assert len(u1) == 2  # 10:00-10:05 block, then 11:00


def test_streaming_pipeline_foreachbatch(spark, tmp_path, stream_input):
    pipe = dlt_spark.pipeline("sp", str(tmp_path / "dest"), "ds", spark)
    sp = StreamingPipeline(pipe, str(tmp_path / "cp_fb"))
    q = sp.write_stream(stream_input, "events_in", write_disposition="append")
    q.awaitTermination(60)
    assert pipe.dataset()["events_in"].row_count() == 5
    assert len(pipe.dataset().load_ids()) >= 1


def test_streaming_replay_is_idempotent(spark, tmp_path, stream_input):
    """A re-delivered micro-batch (same batch_id after a sink failure)
    must be a no-op: the deterministic load id is already committed."""
    pipe = dlt_spark.pipeline("sp2", str(tmp_path / "dest2"), "ds", spark)
    sp = StreamingPipeline(pipe, str(tmp_path / "cp_replay"))
    q = sp.write_stream(stream_input, "events_in", write_disposition="append")
    q.awaitTermination(60)
    n0 = pipe.dataset()["events_in"].row_count()
    loads0 = pipe.dataset().load_ids()
    assert n0 == 5

    # simulate Spark replaying batch 0 into the sink after a crash:
    # run the same data through the idempotence guard with batch_id=0
    lid = sp._batch_load_id(0)
    assert lid in loads0
    batch_df = spark.createDataFrame([(99, "late")], "id long, v string")
    committed = set(pipe.dataset().load_ids())
    if lid not in committed:  # mirror of the sink's guard
        pipe.run(batch_df, table_name="events_in", load_id=lid)
    assert pipe.dataset()["events_in"].row_count() == n0
    assert pipe.dataset().load_ids() == loads0

    # a genuinely new batch id still loads
    lid2 = sp._batch_load_id(7)
    assert lid2 not in committed
    pipe.run(batch_df, table_name="events_in", load_id=lid2)
    assert pipe.dataset()["events_in"].row_count() == n0 + 1


def test_stream_files_source(spark, tmp_path):
    """Auto-ingest: files dropped into a directory become micro-batches."""
    from dlt_spark.streaming import stream_files

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1)\
        .write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("sf", str(tmp_path / "dest_sf"), "ds", spark)
    sp = StreamingPipeline(pipe, str(tmp_path / "cp_sf"))
    q = sp.write_stream(stream_files(spark, str(src)), "files_in")
    q.awaitTermination(60)
    assert pipe.dataset()["files_in"].row_count() == 2

    # drop another file; a second availableNow pass picks up only the new one
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1)\
        .write.mode("append").parquet(str(src))
    q2 = sp.write_stream(stream_files(spark, str(src)), "files_in")
    q2.awaitTermination(60)
    assert pipe.dataset()["files_in"].row_count() == 3


def test_watermark_dedup_within_stream(spark, tmp_path):
    from dlt_spark.streaming import watermark_dedup_within

    src = tmp_path / "in_within"
    src.mkdir()
    df = spark.createDataFrame(
        [
            # same id re-delivered 30s apart (retry restamped at send
            # time) -> ONE survivor; ts is not part of the key
            (1, "2024-01-01 10:00:00", "u1"),
            (1, "2024-01-01 10:00:30", "u1"),
            (2, "2024-01-01 10:05:00", "u2"),
        ],
        "id long, ts string, user string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(src / "batch0"))
    stream = spark.readStream.schema("id long, ts timestamp, user string").parquet(
        str(src / "*")
    )
    q = (
        watermark_dedup_within(stream, "ts", ["id"], delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_within_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_within"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM dedup_within_t").collect()
    assert sorted(r["id"] for r in out) == [1, 2]


def test_monitor_stream_appends_dq_reports(spark, tmp_path):
    """Streaming DQ monitor: every micro-batch's expectation report lands
    in _dlt_dq_reports with a deterministic batch id."""
    from dlt_spark.dataops.expectations import in_range, not_null
    from dlt_spark.streaming import monitor_stream, stream_files

    src = tmp_path / "mon_in"
    src.mkdir()
    spark.createDataFrame(
        [(1, 5.0), (2, 500.0), (None, 7.0)], "id long, v double"
    ).coalesce(1).write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("mon", str(tmp_path / "dest_mon"), "ds", spark)
    q = monitor_stream(
        pipe,
        stream_files(spark, str(src)),
        [not_null("id"), in_range("v", 0, 100)],
        str(tmp_path / "cp_mon"),
        table_name="incoming",
    )
    q.awaitTermination(60)
    rep = {
        (r["check"], r["target"]): r
        for r in pipe.store.read("_dlt_dq_reports").collect()
    }
    assert rep[("not_null", "id")]["metric"] == 1
    assert rep[("in_range", "v")]["metric"] == 1  # 500.0
    assert all(r["table_name"] == "incoming" for r in rep.values())
    assert all(r["load_id"].startswith("stream-batch-") for r in rep.values())


def test_dedup_ingest_stream(spark, tmp_path):
    """Streaming dedup ingestion: in-batch exact dups collapse, and a
    second batch's near-duplicates of already-loaded docs are dropped."""
    from dlt_spark.streaming import dedup_ingest, stream_files

    src = tmp_path / "ddi_in"
    src.mkdir()
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different content here ok")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("ddi", str(tmp_path / "dest_ddi"), "ds", spark)
    q = dedup_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ddi"),
        "docs", "doc_id", "text", shingle_n=3,
    )
    q.awaitTermination(120)
    ids = {r["doc_id"] for r in pipe.store.read("docs").collect()}
    assert ids == {1, 3}  # exact dup 2 collapsed within the batch

    # batch 2: a near-duplicate of doc 1 (one word changed) + a new doc
    spark.createDataFrame(
        [(10, base.replace("today", "tonight")),
         (11, "yet another genuinely novel document body entirely")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    # one changed word in 13 -> jaccard ~0.57 on 3-shingles; use a
    # 0.5 threshold so the near-dup is in range
    q2 = dedup_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ddi"),
        "docs", "doc_id", "text", shingle_n=3, jaccard_threshold=0.5,
    )
    q2.awaitTermination(120)
    ids = {r["doc_id"] for r in pipe.store.read("docs").collect()}
    assert 11 in ids and 10 not in ids  # near-dup of loaded corpus dropped
    assert ids == {1, 3, 11}


def test_dedup_ingest_index_persists_and_self_heals(spark, tmp_path):
    """The streaming dedup index: batches append per-load generations,
    results match the no-index path, and an index wiped behind the
    pipeline's back is rebuilt from the stored rows on the next batch."""
    from pyspark.sql import functions as F

    from dlt_spark.streaming import dedup_ingest, stream_files

    src = tmp_path / "ddx_in"
    src.mkdir()
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [(1, base), (2, "completely different content here ok")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("ddx", str(tmp_path / "dest_ddx"), "ds", spark)
    q = dedup_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ddx"),
        "docs", "doc_id", "text", shingle_n=3, jaccard_threshold=0.5,
    )
    q.awaitTermination(120)
    assert "_dlt_docs_dedup_fp" in pipe.store.list_tables()
    assert "_dlt_docs_dedup_buckets" in pipe.store.list_tables()
    lids0 = {r["_load_id"] for r in pipe.store.read("_dlt_docs_dedup_fp").collect()}
    assert len(lids0) == 1

    # wipe the index (simulate a crash between data commit and index
    # append) — the next batch must rebuild it and still dedup correctly
    pipe.store.drop("_dlt_docs_dedup_fp")
    pipe.store.drop("_dlt_docs_dedup_buckets")
    pipe.store.drop("_dlt_docs_dedup_loads")

    spark.createDataFrame(
        [(10, base.replace("today", "tonight")),  # near-dup of loaded 1
         (11, "yet another genuinely novel document body entirely")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    q2 = dedup_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ddx"),
        "docs", "doc_id", "text", shingle_n=3, jaccard_threshold=0.5,
    )
    q2.awaitTermination(120)
    ids = {r["doc_id"] for r in pipe.store.read("docs").collect()}
    assert ids == {1, 2, 11}  # near-dup 10 dropped via the REBUILT index
    lids = {r["_load_id"] for r in pipe.store.read("_dlt_docs_dedup_fp").collect()}
    assert len(lids) == 2  # backfilled load 0 + appended load 1
    # bucket table carries the full signed corpus
    n_ids = pipe.store.read("_dlt_docs_dedup_buckets").select("_id").distinct().count()
    assert n_ids == 3


def test_stream_conversations_assembles_sessions(spark, tmp_path):
    """Streaming conversation assembly: session windows close past the
    watermark and emit turn-collapsed records with QC counts."""
    import datetime as dt

    from dlt_spark.streaming import stream_conversations

    src = tmp_path / "conv_in"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10)

    def m(minute, eid, role, user=1):
        return (user, t0 + dt.timedelta(minutes=minute), eid, role)

    schema = "user_id long, ts timestamp, event_id long, role string"
    spark.createDataFrame(
        [
            m(0, 1, "user"), m(1, 2, "assistant"), m(2, 3, "assistant"),
            m(3, 4, "user"),
            m(120, 5, "user"), m(121, 6, "assistant"),  # later session
            # a far-future event pushes the watermark so both close
            m(600, 7, "user"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_conversations(stream, "user_id", "ts", "role", "event_id",
                               gap="30 minutes", delay="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("convs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["session_start"]: r for r in spark.sql("SELECT * FROM convs").collect()}
    s1 = rows[t0]
    assert s1["n_messages"] == 4 and s1["n_turns"] == 3 and s1["n_violations"] == 1
    assert s1["transcript"] == "user>assistant>assistant>user"
    s2 = rows[t0 + dt.timedelta(minutes=120)]
    assert s2["n_turns"] == 2 and s2["n_violations"] == 0


def test_sample_ingest_matches_batch_exact_k(spark, tmp_path):
    """The streaming reservoir must equal the one-shot batch exact-k
    over the concatenated stream (hash-min selection is mergeable)."""
    from dlt_spark.dataops.sampling import sample_exact_k
    from dlt_spark.streaming import sample_ingest, stream_files

    src = tmp_path / "smp_in"
    src.mkdir()
    schema = "doc_id long, text string"
    all_rows = [(i, f"doc {i}") for i in range(60)]
    spark.createDataFrame(all_rows[:30], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    pipe = dlt_spark.pipeline("smp", str(tmp_path / "dest_smp"), "ds", spark)
    q = sample_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_smp"),
        "sample", "doc_id", k=10,
    )
    q.awaitTermination(120)

    spark.createDataFrame(all_rows[30:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q2 = sample_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_smp"),
        "sample", "doc_id", k=10,
    )
    q2.awaitTermination(120)

    got = sorted(
        r["doc_id"] for r in pipe.dataset()["sample"].spark_df().collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in sample_exact_k(
            spark.createDataFrame(all_rows, schema), "doc_id", 10
        ).collect()
    )
    assert got == expect and len(got) == 10


def test_decayed_ingest_tracks_batch_recompute(spark, tmp_path):
    """Incrementally maintained decayed scores must match a from-scratch
    decayed_sum over the full history at the same reference instant
    (up to per-batch integer-nano rounding)."""
    import datetime as dt

    from dlt_spark.dataops.timeseries import decayed_sum
    from dlt_spark.streaming import decayed_ingest, stream_files

    src = tmp_path / "dc_in"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)
    b1 = [(1, t0, 10.0), (1, t0 + dt.timedelta(hours=24), 10.0), (2, t0, 4.0)]
    b2 = [(1, t0 + dt.timedelta(hours=48), 10.0), (3, t0 + dt.timedelta(hours=48), 2.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("dcy", str(tmp_path / "dest_dcy"), "ds", spark)
    q = decayed_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_dcy"),
        "scores", "user_id", "ts", "value", half_life_hours=24.0,
    )
    q.awaitTermination(120)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(str(src))
    q2 = decayed_ingest(
        pipe, stream_files(spark, str(src)), str(tmp_path / "cp_dcy"),
        "scores", "user_id", "ts", "value", half_life_hours=24.0,
    )
    q2.awaitTermination(120)

    got = {r["key"]: r["score_nano"] for r in pipe.dataset()["scores"].spark_df().collect()}
    full = spark.createDataFrame(b1 + b2, schema)
    expect = {
        r["user_id"]: r["score_nano"]
        for r in decayed_sum(full, ["user_id"], "ts", "value",
                             "2024-01-03 00:00:00", half_life_hours=24.0).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) <= 5, (k, got[k], expect[k])
    # user 1: 10*(0.25 + 0.5 + 1) at t0+48h = 17.5
    assert abs(got[1] - 17_500_000_000) <= 5


def test_index_ingest_serves_bm25_equal_to_batch(spark, tmp_path):
    """The incrementally appended inverted index must score identically
    to a from-scratch index over the concatenated corpus."""
    from dlt_spark.dataops.search import bm25_from_index, bm25_search
    from dlt_spark.streaming import index_ingest, stream_files

    src = tmp_path / "ix_in"
    src.mkdir()
    schema = "doc_id long, text string"
    b1 = [(1, "spark join vector search"), (2, "join the spark cluster")]
    b2 = [(3, "vector search with spark spark"), (4, "unrelated words here")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(str(src))

    pipe = dlt_spark.pipeline("ix", str(tmp_path / "dest_ix"), "ds", spark)
    q = index_ingest(pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ix"), "docs")
    q.awaitTermination(120)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(str(src))
    q2 = index_ingest(pipe, stream_files(spark, str(src)), str(tmp_path / "cp_ix"), "docs")
    q2.awaitTermination(120)

    postings = pipe.store.read("_dlt_docs_postings").select("token", "doc_id", "tf")
    dlens = pipe.store.read("_dlt_docs_doclens").select("doc_id", "dl")
    got = bm25_from_index(postings, dlens, ["spark", "vector"]).collect()
    full = spark.createDataFrame(b1 + b2, schema)
    expect = bm25_search(full, ["spark", "vector"]).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in expect]
    assert got[0]["doc_id"] == 3  # doubled 'spark' + 'vector' ranks first


def test_index_ingest_replay_drops_partial_generation(spark, tmp_path):
    """A crash between the postings/doclens appends and the marker append
    leaves a partial generation; the replayed batch must drop it before
    re-appending or tf/df/n_docs inflate and every BM25 score is wrong."""
    import hashlib

    from pyspark.sql import functions as F

    from dlt_spark.dataops.search import bm25_from_index, bm25_search
    from dlt_spark.streaming import index_ingest, stream_files

    src = tmp_path / "ix2_in"
    src.mkdir()
    schema = "doc_id long, text string"
    b1 = [(1, "spark join vector search"), (2, "join the spark cluster")]
    b2 = [(3, "vector search with spark spark"), (4, "unrelated words here")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(str(src))

    cp = str(tmp_path / "cp_ix2")
    pipe = dlt_spark.pipeline("ix2", str(tmp_path / "dest_ix2"), "ds", spark)
    q = index_ingest(pipe, stream_files(spark, str(src)), cp, "docs")
    q.awaitTermination(120)

    # simulate the crash: the NEXT batch (id 1) appended its postings and
    # doclens but died before the marker append
    sid = hashlib.sha256(cp.encode()).hexdigest()[:12]
    crashed_lid = f"istream-{sid}-{1:012d}"
    partial_p = spark.createDataFrame(
        [("spark", 3, 2), ("vector", 3, 1)], "token string, doc_id long, tf long"
    ).withColumn("_load_id", F.lit(crashed_lid))
    partial_d = spark.createDataFrame(
        [(3, 5)], "doc_id long, dl long"
    ).withColumn("_load_id", F.lit(crashed_lid))
    pipe.store.append(partial_p, "_dlt_docs_postings")
    pipe.store.append(partial_d, "_dlt_docs_doclens")

    # the replayed batch 1 must self-heal: drop the partials, re-sign
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(str(src))
    q2 = index_ingest(pipe, stream_files(spark, str(src)), cp, "docs")
    q2.awaitTermination(120)

    postings = pipe.store.read("_dlt_docs_postings")
    dlens = pipe.store.read("_dlt_docs_doclens")
    # no duplicated (token, doc) or doc rows
    assert postings.groupBy("token", "doc_id").count().filter("count > 1").count() == 0
    assert dlens.groupBy("doc_id").count().filter("count > 1").count() == 0
    got = bm25_from_index(
        postings.select("token", "doc_id", "tf"), dlens.select("doc_id", "dl"),
        ["spark", "vector"],
    ).collect()
    expect = bm25_search(
        spark.createDataFrame(b1 + b2, schema), ["spark", "vector"]
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in expect]
