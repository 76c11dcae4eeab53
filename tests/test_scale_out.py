"""Focused tests for the r10 narrow-scan scale-out helpers
(text.scale_out_narrow_scan / text.scale_out_staging): the width dial
must come from the session's shuffle conf, fire only on narrow inputs,
and never change results."""

from pyspark.sql import functions as F

from dlt_spark.dataops.text import (
    kernel_width,
    scale_out_narrow_scan,
    scale_out_staging,
)


def test_kernel_width_reads_shuffle_conf(spark):
    # conftest session pins spark.sql.shuffle.partitions=8
    df = spark.range(10)
    assert kernel_width(df) == 8


def test_narrow_scan_widens_single_partition_input(spark):
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    out = scale_out_narrow_scan(narrow)
    assert out.rdd.getNumPartitions() == kernel_width(narrow)


def test_narrow_scan_is_identity_on_wide_input(spark):
    # >= half the shuffle width: no repartition, the exact same frame
    wide = spark.range(1000).repartition(4)
    assert scale_out_narrow_scan(wide) is wide


def test_staging_lays_out_at_kernel_width(spark):
    df = spark.range(100).coalesce(1)
    assert scale_out_staging(df).rdd.getNumPartitions() == kernel_width(df)


def test_source_overlap_matrix_unchanged_by_scale_out(spark, monkeypatch):
    from dlt_spark.dataops import contamination
    from dlt_spark.dataops.contamination import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "a"),
            (2, "the quick brown fox sleeps all day long", "b"),
            (3, "a completely different sentence with no overlap here", "b"),
            (4, "the quick brown fox jumps over the lazy dog again", "c"),
        ],
        "doc_id int, text string, source string",
    ).coalesce(1)

    with_scale_out = sorted(
        map(tuple, source_overlap_matrix(docs, "text", "source", n=3).collect())
    )

    import dlt_spark.dataops.text as text_mod

    monkeypatch.setattr(text_mod, "scale_out_narrow_scan", lambda df: df)
    without = sorted(
        map(tuple, source_overlap_matrix(docs, "text", "source", n=3).collect())
    )
    assert with_scale_out == without
    assert len(with_scale_out) > 0
