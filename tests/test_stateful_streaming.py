"""applyInPandasWithState custom stateful operator test: per-key state
carries across micro-batches within one streaming query."""

import pytest

from dlt_spark.streaming import stateful_running_agg


def test_stateful_running_agg(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("u1", 1.0), ("u1", 2.0), ("u2", 5.0)], "user string, value double"
    ).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(
        [("u1", 4.0)], "user string, value double"
    ).coalesce(1).write.parquet(str(src / "b1"))

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema("user string, value double")
            .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
            .parquet(str(src / "*"))
        )
        agg = stateful_running_agg(stream, keys=["user"], value_col="value")
        q = (
            agg.writeStream.format("memory")
            .queryName("running_agg")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    rows = spark.sql("SELECT * FROM running_agg").collect()
    # update mode appends one row per key per micro-batch; the final
    # state is the row with the highest n per key
    final = {}
    for r in rows:
        if r["user"] not in final or r["n"] > final[r["user"]][0]:
            final[r["user"]] = (r["n"], r["total"])
    assert final["u1"] == (3, 7.0)  # state carried across micro-batches
    assert final["u2"] == (1, 5.0)
