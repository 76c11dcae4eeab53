"""Unit tests for gap_fill and rolling_anomalies."""

from pyspark.sql import functions as F

from dlt_spark.dataops.timeseries import gap_fill, rolling_anomalies


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_gap_fill_fills_missing_buckets_forward(spark):
    df = _events(spark, [
        ("a", "2024-01-01 00:30:00", 10.0),
        ("a", "2024-01-01 00:45:00", 20.0),
        # hours 01 and 02 missing entirely
        ("a", "2024-01-01 03:10:00", 40.0),
        ("b", "2024-01-01 00:00:00", 1.0),
    ])
    out = {(r["k"], r["bucket_ts"].hour): r for r in
           gap_fill(df, "k", "ts", "value", interval_s=3600).collect()}
    assert len(out) == 5                       # a: 00..03, b: 00
    assert out[("a", 0)]["avg_value"] == 15.0
    assert out[("a", 1)]["is_gap"] and out[("a", 1)]["n"] == 0
    assert out[("a", 1)]["filled_value"] == 15.0   # carried forward
    assert out[("a", 2)]["filled_value"] == 15.0
    assert not out[("a", 3)]["is_gap"] and out[("a", 3)]["filled_value"] == 40.0
    assert out[("b", 0)]["n"] == 1


def test_gap_fill_partition_layout_independent(spark):
    rows = [("a", f"2024-01-01 {h:02d}:00:00", float(h)) for h in range(0, 20, 3)]
    df = _events(spark, rows)
    a = sorted(map(tuple, gap_fill(df, "k").collect()))
    b = sorted(map(tuple, gap_fill(df.repartition(7), "k").collect()))
    assert a == b


def test_rolling_anomalies_flags_spike(spark):
    rows = []
    for d in range(1, 10):                     # 9 steady days, 5 events each
        n = 50 if d == 8 else 5                # day 8 is a 10x spike
        rows += [("a", f"2024-01-{d:02d} 12:00:00", 1.0)] * n
    df = _events(spark, rows)
    out = {r["bucket_ts"].day: r for r in
           rolling_anomalies(df, "k", "ts", bucket_s=86400, window=7).collect()}
    assert out[8]["is_anomaly"] and out[8]["z"] > 2
    assert not out[5]["is_anomaly"]
    # zero-variance window -> null z, not a crash or a flag
    assert out[5]["z"] is None
    assert out[1]["z"] is None                 # single-bucket window


def test_rolling_anomalies_window_is_trailing(spark):
    # the spike must not contaminate scores of EARLIER days
    rows = [("a", f"2024-01-{d:02d} 00:00:00", 1.0) for d in range(1, 8)]
    rows += [("a", "2024-01-08 00:00:00", 1.0)] * 99
    df = _events(spark, rows)
    out = {r["bucket_ts"].day: r for r in
           rolling_anomalies(df, "k", window=3).collect()}
    assert out[7]["mean_n"] == 1.0             # days 5-7 all count 1
    assert out[8]["mean_n"] > 30


def test_decayed_sum_half_life(spark):
    import datetime as dt

    from dlt_spark.dataops.timeseries import decayed_sum

    t0 = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (1, t0, 10.0),                                  # age 0 -> weight 1
        (1, t0 - dt.timedelta(hours=24), 10.0),         # one half-life -> 0.5
        (1, t0 - dt.timedelta(hours=48), 10.0),         # two -> 0.25
        (2, t0, 4.0),
        (2, None, 99.0),                                 # null ts dropped
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {
        r["k"]: r
        for r in decayed_sum(df, ["k"], "ts", "v", "2024-01-02 00:00:00",
                             half_life_hours=24.0).collect()
    }
    assert out[1]["n_events"] == 3
    assert abs(out[1]["score_nano"] - 17_500_000_000) <= 3
    assert out[2]["n_events"] == 1 and out[2]["score_nano"] == 4_000_000_000


def test_rolling_distinct_window_semantics(spark):
    import datetime as dt

    from dlt_spark.dataops.timeseries import rolling_distinct

    d = dt.date(2024, 1, 1)
    rows = [
        (dt.datetime.combine(d, dt.time(1)), 1),
        (dt.datetime.combine(d, dt.time(2)), 1),   # dup same day
        (dt.datetime.combine(d, dt.time(3)), 2),
        (dt.datetime.combine(d + dt.timedelta(days=1), dt.time(1)), 1),
        (dt.datetime.combine(d + dt.timedelta(days=3), dt.time(1)), 3),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {r["day"]: r for r in rolling_distinct(df, "ts", "user_id", window_days=2).collect()}
    assert out[d]["day_distinct"] == 2 and out[d]["rolling_distinct"] == 2
    d1 = d + dt.timedelta(days=1)
    # day1 window = {day0, day1}: users {1,2} from day0 plus {1} -> 2
    assert out[d1]["day_distinct"] == 1 and out[d1]["rolling_distinct"] == 2
    d3 = d + dt.timedelta(days=3)
    # day3 window = {day2, day3}: only user 3
    assert out[d3]["rolling_distinct"] == 1
    # day2 has no events -> not emitted
    assert (d + dt.timedelta(days=2)) not in out
