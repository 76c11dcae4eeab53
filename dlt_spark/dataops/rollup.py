"""Incremental rollup maintenance: continuous aggregates as mergeable
partial-aggregate state.

The hypertable/materialized-view pattern at 100 TB: never re-scan
history to refresh an aggregate.  Each batch reduces to a tiny partial
state table (per time-bucket × keys: count / sum / min / max), and the
stored rollup advances by an *additive merge* of states — the same
algebra Spark uses internally for map-side partial aggregation, made
persistent across batches:

    state(A ∪ B) = combine(state(A), state(B))     (exactly)

``sum`` runs in DECIMAL so the merge is associative to the bit —
double sums would drift with aggregation order and break both
cross-engine verification and the merge-vs-recompute equivalence that
makes incremental maintenance trustworthy.

In production the state table persists in the TableStore and each
micro-batch upserts via ``rollup_merge(stored, rollup_state(batch))``;
``rollup_finalize`` derives the serving view (avg etc.) on read.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column, bucket_seconds: int) -> Column:
    """Floor-epoch bucketing (engine-portable integer arithmetic).
    SQL: ``to_timestamp((epoch(ts)::BIGINT // N) * N)``."""
    return F.timestamp_seconds(
        (F.unix_timestamp(ts) / bucket_seconds).cast("long") * bucket_seconds
    )


def rollup_state(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Reduce a batch to partial-aggregate state: one row per
    (bucket, keys) with additive counters.  One shuffle; output is
    bucket-count sized, not row-count sized."""
    bucket = time_bucket(F.col(time_col), bucket_seconds).alias("bucket")
    v = F.col(value_col)
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(38,6)")).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def rollup_merge(*states: DataFrame) -> DataFrame:
    """Combine partial states — the incremental-refresh step.  Additive
    counters merge exactly (decimal sums are associative), so merging
    per-batch states equals recomputing over the union."""
    keys = [c for c in states[0].columns if c not in ("n", "sum_v", "min_v", "max_v")]
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_finalize(state: DataFrame, decimals: int = 6) -> DataFrame:
    """Serving view over the state: derived averages, doubles rounded
    for presentation."""
    keys = [c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")]
    return state.select(
        *keys,
        F.col("n"),
        # round the DECIMAL, then one cast: round(double, n) diverges
        # across engines by one ULP once |sum| * 10^n nears 2^53 (r9:
        # tpch_q1's 2.7e11 revenue sum hashed differently at the 60M-row
        # replica); decimal rounding is exact on both sides
        F.round(F.col("sum_v"), decimals).cast("double").alias("sum_v"),
        F.round(F.col("min_v"), decimals).alias("min_v"),
        F.round(F.col("max_v"), decimals).alias("max_v"),
        # avg in exact micro-units: the decimal sum is an exact integer at
        # scale `decimals`; floor of its double division by n is
        # bit-identical everywhere.  Engine round() at half boundaries is
        # NOT (Spark rounds the exact decimal expansion, DuckDB rounds a
        # float-scaled value) — found by the sf0.1 oracle stress run.
        (
            F.floor(
                (F.col("sum_v") * F.lit(10 ** decimals)).cast("bigint").cast("double")
                / F.col("n")
            )
            / F.lit(float(10 ** decimals))
        ).alias("avg_v"),
    )
