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
