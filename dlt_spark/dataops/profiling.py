"""Table profiling: per-column quality statistics in ONE scan.

The operational companion to schema contracts: before/after a load,
profile the table and alert on drift (null spikes, cardinality
collapse, range excursions).  The reference has no profiler; warehouses
bolt one on — here it is a DataFrame program.

One pass produces every column's stats as a single wide aggregation
(null counts, exact distincts, min/max rendered to strings), then a
``stack`` unpivot turns it into one row per column.  Exact distinct
counts shuffle once; swap :func:`approx_profile` in at extreme scale
(same shape, ``approx_count_distinct`` sketch partials, no extra
shuffle).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats_exprs(cols: Sequence[str], exact: bool) -> List:
    # aliases are index-keyed, never interpolate raw column names (a
    # column named "a b" or "x'y" must not break the stack() unpivot)
    out = []
    for i, c in enumerate(cols):
        col = F.col(c)
        distinct = (
            F.countDistinct(col) if exact else F.approx_count_distinct(col)
        )
        out += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(col.isNull().cast("bigint")).alias(f"__nulls_{i}"),
            distinct.alias(f"__dist_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    return out


def profile(
    df: DataFrame, columns: Optional[Sequence[str]] = None, exact: bool = True
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value)``.  ``exact=False`` switches the
    distinct counts to HLL sketches for the 100 TB path."""
    cols = list(columns or df.columns)
    wide = df.agg(*_stats_exprs(cols, exact))

    def _q(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{_q(c)}, __n_{i}, __nulls_{i}, __dist_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    long = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
    return long.select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Fixed-bin histogram of a numeric column: one groupBy on the
    integer bin id (scan + single shuffle of at most ``bins`` rows).
    Values below/above the range clamp to the edge bins; bin assignment
    is pure integer arithmetic on a deterministic double expression, so
    the result is engine-portable.  Returns ``(bin, lo_edge, hi_edge,
    n)`` for every non-empty bin."""
    width = (hi - lo) / bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bin_id = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("bigint")
    out = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        "bin",
        F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo_edge"),
        F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi_edge"),
        "n",
    )


def token_distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    smooth: float = 0.5,
) -> DataFrame:
    """Token-distribution drift between two corpus slices (releases,
    sources, time windows): per-token KL contribution of A vs B plus
    total-variation share, top-``top_k`` drivers.  The monitoring step a
    training pipeline runs before mixing a new crawl into the corpus.

    Both slices reduce to (token, count) tables — a full-outer join of
    two Zipf-sized vocabularies, NOT of the corpora — with add-``smooth``
    smoothing so one-sided tokens stay finite.  Per-token contribution
    ``p * ln(p/q)`` (nats, rounded to 9 decimals); ``tv = |p - q| / 2``.
    Top-k is a TakeOrdered (per-partition heaps), ties broken by token.

    Returns ``(token, cnt_a, cnt_b, kl_contrib, tv_share)``.
    """
    def vocab(d: DataFrame, out: str) -> DataFrame:
        toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        return (
            d.filter(F.col(text_col).isNotNull())
            .select(F.explode(toks).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(out))
        )

    va, vb = vocab(df_a, "cnt_a"), vocab(df_b, "cnt_b")
    j = va.join(vb, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
    )
    # totals AFTER the join so both sides share one smoothed vocabulary
    tot = j.agg(
        F.sum("cnt_a").alias("na"),
        F.sum("cnt_b").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("cnt_a") + F.lit(smooth)) / (F.col("na") + F.lit(smooth) * F.col("v"))
    q = (F.col("cnt_b") + F.lit(smooth)) / (F.col("nb") + F.lit(smooth) * F.col("v"))
    return (
        j.join(F.broadcast(tot))
        .select(
            "token",
            "cnt_a",
            "cnt_b",
            F.round(p * F.log(p / q), 9).alias("kl_contrib"),
            F.round(F.abs(p - q) / F.lit(2.0), 9).alias("tv_share"),
        )
        .orderBy(F.desc("kl_contrib"), F.col("token"))
        .limit(top_k)
    )


def key_skew_diagnostics(
    df: DataFrame,
    key: str,
    percentiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Shuffle-key skew profile: the "will this groupBy/join hot-spot"
    question answered from one scan BEFORE launching the expensive job.

    Aggregates per-key counts (one map-combined shuffle over the keys —
    the same exchange the real job would do, minus its payload), then
    reduces the count distribution to a single row: row/key totals, the
    max and percentile key sizes, the skew factor (max/avg), and a
    salting-factor recommendation ``ceil(max_cnt / p99_cnt)`` — the
    number of salt buckets that levels the hottest key down to p99 size
    (1 = don't salt).  Exact interpolated percentiles (``percentile``,
    the DuckDB ``quantile_cont`` twin) over the per-key count table:
    |keys| rows, orders of magnitude smaller than the input.

    Returns ``(n_rows, n_keys, max_cnt, p50_cnt, p90_cnt, p99_cnt,
    skew_factor, salt_factor)``.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    p50, p90, p99 = percentiles
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr(f"percentile(cnt, {p50})"), 6).alias("p50_cnt"),
        F.round(F.expr(f"percentile(cnt, {p90})"), 6).alias("p90_cnt"),
        F.round(F.expr(f"percentile(cnt, {p99})"), 6).alias("p99_cnt"),
        F.round(F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1))), 6).alias(
            "skew_factor"
        ),
    ).select(
        "*",
        F.ceil(F.col("max_cnt") / F.col("p99_cnt")).cast("bigint").alias("salt_factor"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    decimals: int = 6,
) -> DataFrame:
    """Per-group robust statistics: winsorized mean/std (values clipped
    to the exact interpolated [lo, hi] percentiles) plus the median
    absolute deviation — outlier-resistant quality metrics for numeric
    feature columns.

    Two grouped aggregations + one broadcast join of the tiny bounds
    table; no global sort.  Mean/variance come from decimal-exact sums
    (order-independent partial aggregation → bit-identical under any
    partitioning); the percentiles are Spark's exact sort-within-group
    ``percentile`` whose linear interpolation matches ANSI
    ``quantile_cont``.  At extreme scale swap ``percentile_approx`` in
    for the bounds (same shape, sketch partials).
    """
    v = F.col(value_col)
    # native percentile (not an f-string expr) so arbitrary column names
    # — spaces, quotes — cannot break or inject into the parser
    bounds = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(lo)).alias("_lo"),
        F.percentile(v, F.lit(hi)).alias("_hi"),
        F.percentile(v, F.lit(0.5)).alias("_med"),
    )
    j = df.join(F.broadcast(bounds), group_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    agg = j.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(clipped.cast("decimal(38,6)")).alias("_s1"),
        F.sum((clipped * clipped).cast("decimal(38,6)")).alias("_s2"),
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad"),
    )
    n = F.col("n")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    return agg.select(
        group_col,
        n,
        F.round(s1 / n, decimals).alias("wins_mean"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))), decimals).alias(
            "wins_std"
        ),
        F.round(F.col("_mad"), decimals).alias("mad"),
    ).orderBy(group_col)


def ab_welch_test(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    group_cols: Optional[Sequence[str]] = None,
    control: Optional[str] = None,
) -> DataFrame:
    """Welch's unequal-variance t-test between every variant and the
    control — the experimentation readout (uplift + significance) over
    event streams.

    Returns one row per (group, variant != control): ``(…group, variant,
    n_c, n_v, mean_c, mean_v, uplift, t_nano, dof_nano)`` with the t
    statistic and Welch–Satterthwaite degrees of freedom quantized to
    integer nanos.  ``control`` defaults to the lexicographically
    smallest variant.

    Engine-exact: per-variant moments are DECIMAL sums (order-
    independent); means/variances/t derive from those exact sums with a
    fixed double op order, then quantize — reproducible in SQL.  One
    grouped aggregation over the events + a broadcast self-join of the
    tiny per-variant stats table."""
    gcols = list(group_cols or [])
    v = F.col(value_col)
    stats = df.groupBy(*gcols, F.col(variant_col).alias("variant")).agg(
        F.count(v).alias("n"),
        F.sum(v.cast("decimal(38,6)")).alias("s1"),
        F.sum((v * v).cast("decimal(38,6)")).alias("s2"),
    )
    if control is None:
        ctl_pick = stats.groupBy(*gcols).agg(F.min("variant").alias("_ctl"))
        stats_c = stats.join(
            F.broadcast(ctl_pick), gcols if gcols else None
        ).filter(F.col("variant") == F.col("_ctl"))
    else:
        stats_c = stats.filter(F.col("variant") == control)
    c = stats_c.select(
        *gcols,
        F.col("n").alias("n_c"),
        F.col("s1").alias("s1_c"),
        F.col("s2").alias("s2_c"),
        F.col("variant").alias("_ctl_name"),
    )
    joined = (
        stats.join(F.broadcast(c), gcols if gcols else None)
        .filter(F.col("variant") != F.col("_ctl_name"))
    )
    n1, n2 = F.col("n_c").cast("double"), F.col("n").cast("double")
    m1 = F.col("s1_c").cast("double") / n1
    m2 = F.col("s1").cast("double") / n2
    var1 = (F.col("s2_c").cast("double") - F.col("s1_c").cast("double") * m1) / (n1 - 1)
    var2 = (F.col("s2").cast("double") - F.col("s1").cast("double") * m2) / (n2 - 1)
    se1, se2 = var1 / n1, var2 / n2
    t = (m2 - m1) / F.sqrt(se1 + se2)
    dof = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return joined.filter((F.col("n_c") >= 2) & (F.col("n") >= 2)).select(
        *gcols,
        "variant",
        F.col("n_c"),
        F.col("n").alias("n_v"),
        F.round(m1, 6).alias("mean_c"),
        F.round(m2, 6).alias("mean_v"),
        F.round(m2 - m1, 6).alias("uplift"),
        F.round(t * F.lit(1000000000.0)).cast("bigint").alias("t_nano"),
        F.round(dof * F.lit(1000000000.0)).cast("bigint").alias("dof_nano"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Corpus release diff: one row ``(n_added, n_removed, n_changed,
    n_unchanged)`` comparing two snapshots by id + content fingerprint —
    the "what changed between corpus v1 and v2" release-notes /
    retraining-trigger summary.

    One full-outer join on the id key with sha256 content fingerprints
    compared join-local; a single conditional aggregation — no
    row-level collect, counts exact."""
    from .text import fingerprint

    o = old.select(
        F.col(id_col).alias("_id"), fingerprint(F.col(text_col)).alias("_fo")
    )
    n = new.select(
        F.col(id_col).alias("_id"), fingerprint(F.col(text_col)).alias("_fn")
    )
    j = o.join(n, "_id", "full_outer")
    return j.agg(
        F.sum(F.when(F.col("_fo").isNull(), 1).otherwise(0)).cast("bigint").alias("n_added"),
        F.sum(F.when(F.col("_fn").isNull(), 1).otherwise(0)).cast("bigint").alias("n_removed"),
        F.sum(
            F.when(
                F.col("_fo").isNotNull()
                & F.col("_fn").isNotNull()
                & (F.col("_fo") != F.col("_fn")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_changed"),
        F.sum(
            F.when(F.col("_fo") == F.col("_fn"), 1).otherwise(0)
        ).cast("bigint").alias("n_unchanged"),
    )
