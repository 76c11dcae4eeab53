"""Z-order (Morton-curve) clustering for multi-dimensional file skipping.

A linear ``sort_by`` gives the ParquetTableStore manifest tight per-file
min/max on the LEADING sort column only — a range predicate on any other
column still opens every file.  Z-ordering interleaves the bits of
several quantized columns into one clustering key, so each written file
covers a small hyper-rectangle of the combined space: range predicates
on ANY of the z-columns skip most files (the Delta ``OPTIMIZE ZORDER
BY`` analog, built from plain Column expressions).

Flow (all distributed; the only driver work is one min/max row):

1. one aggregation collects each column's min/max (or pass ``ranges``);
2. each column scales to a ``bits``-wide integer rank;
3. bit-interleave → 1 BIGINT z-key (pure shifts/ors — codegen);
4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` clusters
   files along the curve;
5. ``TableStore.overwrite(..., sort_by=cols)`` records per-file min/max
   of the ORIGINAL columns; because files are curve-clustered, every
   z-column's per-file range is tight, and ``store.read(where=...)``
   prunes on each of them.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    ranges: Dict[str, Tuple[float, float]], bits: int = 16
) -> Column:
    """BIGINT Morton key interleaving the ``bits``-bit ranks of each
    column in ``ranges`` (col -> (lo, hi)).  ``bits * len(ranges)`` must
    stay <= 62."""
    cols = list(ranges.items())
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds BIGINT range")
    maxv = (1 << bits) - 1
    ranks = []
    for _, (name, (lo, hi)) in enumerate(cols):
        if lo is None or hi is None:
            # all-NULL or empty column: no spread to rank on — it
            # contributes a constant coordinate instead of a TypeError
            ranks.append(F.lit(0).cast("bigint"))
            continue
        span = float(hi) - float(lo)
        if span <= 0:
            ranks.append(F.lit(0).cast("bigint"))
            continue
        scaled = (
            (F.col(name).cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(maxv))
        ).cast("bigint")
        ranks.append(F.least(F.lit(maxv), F.greatest(F.lit(0), scaled)))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for idx, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + idx))
    return z


def column_ranges(df: DataFrame, cols: Sequence[str]) -> Dict[str, Tuple[float, float]]:
    """One scan, one driver row: min/max per z column."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}


def quantile_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8, relative_error: float = 0.01
) -> Column:
    """Skew-robust Morton key: each column's rank comes from its own
    approximate quantile boundaries instead of an equal-width split.

    Equal-width ranks collapse under skew — a power-law column packs
    99% of rows into one bucket, so that dimension stops contributing
    pruning power.  Quantile boundaries give every bucket ~equal row
    mass regardless of distribution, which is what keeps per-file
    hyper-boxes balanced (the same reason Delta's OPTIMIZE ZORDER
    range-partitions on sampled ranks).

    Cost: one ``approxQuantile`` pass (Greenwald-Khanna sketch — a
    single scan, driver gets ``2^bits`` boundaries per column); the
    per-row rank is a counting fold over the broadcast boundary array
    (``aggregate(boundaries, 0, acc + (v >= b))``) — pure codegen,
    2^bits comparisons per row, so keep ``bits`` <= 10 in this mode."""
    n_buckets = 1 << bits
    k = len(cols)
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds BIGINT range")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    z = F.lit(0).cast("bigint")
    for idx, c in enumerate(cols):
        qs = df.approxQuantile(c, probs, relative_error)
        # strictly increasing boundaries (duplicates collapse buckets)
        bounds: list = []
        for qv in qs:
            if not bounds or qv > bounds[-1]:
                bounds.append(qv)
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        rank = F.aggregate(
            arr,
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
        )
        for i in range(bits):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + idx))
    return z


def zorder(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
    ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    mode: str = "width",
) -> DataFrame:
    """Return ``df`` clustered along the Morton curve of ``cols`` into
    ``num_files`` range partitions (one output file each).  Feed the
    result straight to ``TableStore.overwrite(..., sort_by=list(cols))``
    so the manifest records each file's tight per-column min/max.

    ``mode="width"`` (default): equal-width ranks from one min/max row —
    cheapest, right for roughly uniform columns.  ``mode="quantile"``:
    sketch-based equal-mass ranks (see :func:`quantile_zorder_key`) —
    use on skewed columns; ``bits`` is capped at 8 there."""
    if mode == "quantile":
        z = quantile_zorder_key(df, cols, bits=min(bits, 8))
    else:
        ranges = ranges or column_ranges(df, cols)
        z = zorder_key(ranges, bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
