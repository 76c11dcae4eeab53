"""Time-series operators: bucket spine gap-fill and rolling anomalies.

Hypertable-style operations an event pipeline needs around the rollup
(`rollup.py`) and sessionization queries: materialize a dense,
regular-interval series per key from an irregular event stream
(gap_fill) and flag buckets that break the recent trend
(rolling_anomalies).

Scale design (100 TB of events):

- Both reduce the raw stream to per-(key, bucket) aggregates FIRST —
  one map-combined shuffle whose output is |keys| x |buckets| rows,
  orders of magnitude smaller than the input; every later stage
  (spine join, forward-fill window, rolling window) runs on that
  reduced table.
- The spine is generated per key from its own [min, max] bucket range
  (a tiny per-key aggregate), so no key pays for another key's time
  span; the explode is narrow.
- Windows partition by key and order by bucket: per-partition sorts of
  bounded per-key series, never a global sort.
- Rolling moments use integer/decimal partial sums (sum, sum of
  squares), so results are independent of partial-aggregation order and
  bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    interval_s: int = 3600,
) -> DataFrame:
    """Dense per-key series with carry-forward fill: bucket the stream,
    build each key's full bucket spine, left-join the aggregates and
    forward-fill missing buckets with the last observed average.

    Returns ``(key, bucket_ts, n, avg_value, filled_value, is_gap)`` —
    ``n`` is 0 and ``is_gap`` true for spine buckets with no events;
    ``filled_value`` carries the previous bucket's average forward (null
    until the key's first observation).
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / interval_s).cast("long")
    # integer micro-units end to end: double round(sum/n, 6) sits on a
    # half boundary whenever sum/n has a 7th decimal of exactly 5 (one
    # such bucket per ~1e6 — observed at sf0.1), and engines then round
    # the unrepresentable double differently.  round-half-up over exact
    # integers instead (values are assumed non-negative; micros fit a
    # BIGINT to ~9e18, i.e. ~1e12 rows of 1e6-scale values per bucket).
    micros = F.round(F.col(value_col) * F.lit(1000000.0)).cast("bigint")
    agg = (
        df.groupBy(F.col(key), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(micros).alias("_sum6"),
        )
        .select(
            key,
            "bucket",
            "n",
            (
                F.expr("(2 * _sum6 + n) div (2 * n)").cast("double")
                / F.lit(1000000.0)
            ).alias("avg_value"),
        )
    )
    rng = agg.groupBy(key).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    spine = rng.select(
        key, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    joined = spine.join(agg, [key, "bucket"], "left")
    w = Window.partitionBy(key).orderBy("bucket")
    return joined.select(
        key,
        F.timestamp_seconds(F.col("bucket") * interval_s).alias("bucket_ts"),
        F.coalesce("n", F.lit(0)).alias("n"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


def rolling_anomalies(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    bucket_s: int = 86400,
    window: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Volume-anomaly detection: per-key bucket counts scored against
    the trailing ``window``-bucket mean/stddev (the bucket itself
    included, matching the SQL ``ROWS BETWEEN n-1 PRECEDING AND CURRENT
    ROW`` frame).  Rolling moments come from integer partial sums
    (``sum`` and ``sum of squares`` of counts), so mean, sample stddev,
    and z are pure functions of the window contents — engine- and
    order-independent.

    Returns ``(key, bucket_ts, n, mean_n, z, is_anomaly)``; ``z`` is
    null for windows with zero variance or fewer than 2 buckets.
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / bucket_s).cast("long")
    counts = df.groupBy(F.col(key), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    k = F.count(F.lit(1)).over(w)
    mean = s1.cast("double") / k
    # sample variance from integer sums: (s2 - s1^2/k) / (k-1)
    var = (s2.cast("double") - s1.cast("double") * s1.cast("double") / k) / (k - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    out = counts.select(
        key,
        F.timestamp_seconds(F.col("bucket") * bucket_s).alias("bucket_ts"),
        "n",
        F.round(mean, 6).alias("mean_n"),
        F.when((k >= 2) & (var > 0), F.round(z, 6)).alias("z"),
    )
    return out.withColumn(
        "is_anomaly", F.coalesce(F.abs(F.col("z")) > z_threshold, F.lit(False))
    )


def trend_slopes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    per_seconds: float = 86400.0,
    decimals: int = 6,
) -> DataFrame:
    """Per-key OLS trend: slope (value units per ``per_seconds``,
    default per day) and intercept of ``value`` regressed on event time
    — drift detection over metric streams without a per-key sort.

    Closed-form regression from order-independent sums: x is integer
    microseconds re-centred on the key's own min (two grouped
    aggregations + a broadcast join of the tiny min table — re-centring
    keeps x*x inside exact double range for multi-year spans), and all
    four moment sums accumulate as decimals, so the result is
    bit-identical under any partitioning.  Keys whose events all share
    one timestamp (zero x-variance) are dropped.
    """
    us = F.unix_micros(F.col(ts_col))
    t0 = df.groupBy(key_col).agg(F.min(us).alias("_t0"))
    j = df.join(F.broadcast(t0), key_col)
    x = (us - F.col("_t0")).cast("double")  # microseconds from key start
    y = F.col(value_col)
    agg = j.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(38,6)")).alias("_sx"),
        F.sum(y.cast("decimal(38,6)")).alias("_sy"),
        F.sum((x * y).cast("decimal(38,6)")).alias("_sxy"),
        F.sum((x * x).cast("decimal(38,6)")).alias("_sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    denom = n * sxx - sx * sx
    slope_us = (n * sxy - sx * sy) / denom  # units per microsecond
    return (
        agg.filter(denom > 0)
        .select(
            key_col,
            "n",
            F.round(slope_us * F.lit(per_seconds * 1_000_000.0), decimals).alias(
                "slope"
            ),
            F.round((sy - slope_us * sx) / n, decimals).alias("intercept"),
        )
        .orderBy(key_col)
    )


def decayed_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    reference_ts: str,
    half_life_hours: float = 24.0,
) -> DataFrame:
    """Exponentially time-decayed per-key aggregate: ``score = sum_i
    value_i * 0.5^(age_i / half_life)`` with age measured back from an
    EXPLICIT ``reference_ts`` (ISO string — passed in, never "now", so
    results are reproducible).  The freshness-weighted engagement /
    sampling-priority primitive.

    Returns ``(…key_cols, n_events, score_nano)``.  Each row's decayed
    term is quantized to integer nanos BEFORE the sum, so the per-key
    aggregate is exact BIGINT arithmetic in any order — engine-exact.

    Scale shape: pure Column decay inside the scan, one grouped
    aggregation — nothing else."""
    import datetime as _dt

    try:
        _dt.datetime.fromisoformat(reference_ts)
    except ValueError as ex:
        raise ValueError(
            f"reference_ts {reference_ts!r} is not an ISO timestamp"
        ) from ex
    ref_ms = F.unix_millis(F.to_timestamp(F.lit(reference_ts)))
    age_h = (ref_ms - F.unix_millis(F.col(ts_col))).cast("double") / F.lit(3600000.0)
    decay = F.pow(F.lit(0.5), age_h / F.lit(float(half_life_hours)))
    term = F.round(F.col(value_col).cast("double") * decay * F.lit(1000000000.0)).cast(
        "bigint"
    )
    return (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(term).alias("score_nano"))
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct counts per day (e.g. rolling 7-day
    active users) — the metric a naive per-day `COUNT(DISTINCT)` over a
    range self-join makes quadratic.

    Scale shape: reduce ONCE to distinct ``(day, key)``; each such pair
    contributes to the ``window_days`` target days it is visible in
    (one bounded explode), then one distinct + one count per target
    day — total cost ∝ |day-key pairs| × window, no self-join, no
    per-day rescan.  Exact integer counts.

    Returns ``(day, day_distinct, rolling_distinct)`` for every day
    present in the data; the trailing window covers days
    ``[day - window_days + 1, day]``."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.to_date(F.col(ts_col))
    pairs = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(day.alias("_day"), F.col(key_col).alias("_k"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    per_day = pairs.groupBy(F.col("_day").alias("day")).agg(
        F.count(F.lit(1)).alias("day_distinct")
    )
    contrib = (
        pairs.select(
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_o"),
            "_day",
            "_k",
        )
        .select(F.date_add(F.col("_day"), F.col("_o")).alias("day"), "_k")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("rolling_distinct"))
    )
    return per_day.join(contrib, "day").select(
        "day", "day_distinct", "rolling_distinct"
    )
