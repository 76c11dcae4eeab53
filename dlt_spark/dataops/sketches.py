"""Mergeable distinct-count sketches (HyperLogLog) as DataFrame programs.

The reference engine has no approximate/statistical operators at all
(SURVEY §2.H note); Spark's built-in ``approx_count_distinct`` gives an
estimate but not a *persistable, mergeable* sketch.  This module builds
classic HLL (Flajolet et al. 2007) from plain DataFrame ops:

- ``hll_sketch``  — per-bucket max-rank table: the sketch.  Tiny
  (≤ 2^p rows), persistable as a table, and **mergeable**: the sketch of
  a union is the bucket-wise max of the sketches, so per-batch/partition
  sketches combine without re-scanning history (the property that makes
  distinct-user counts over a 100 TB event log a per-batch increment).
- ``hll_merge``   — that bucket-wise max.
- ``hll_estimate``— harmonic-mean estimate with the standard
  small-range (linear counting) correction.

Determinism/portability: the hash is the repo's standard 52-bit sha256
recipe (cross-engine, partition/retry independent — same as
:mod:`dlt_spark.dataops.sampling`), ranks are integers derived via
string ops (no float log2 at bit boundaries), and the harmonic sum is
computed in *scaled integer space* (``2^(rmax+1-r)`` per bucket, exact
in BIGINT) so bucket order cannot perturb a floating sum.  The whole
estimate is reproduced verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 52  # 13 hex chars of sha256: exact in BIGINT and double


def _hash52(col: Column, salt: str = "hll") -> Column:
    h = F.sha2(F.concat(F.lit(f"{salt}:"), col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(df: DataFrame, col: str, p: int = 8, salt: str = "hll") -> DataFrame:
    """Build the sketch: ``(bucket, r)`` with at most ``2^p`` rows.

    bucket = top ``p`` hash bits; ``r`` = max over values of the 1-based
    position of the first set bit in the remaining ``52-p`` bits
    (``52-p+1`` when they are all zero).  One shuffle on ``bucket``
    after a map-side partial max — scan-bound at any scale.
    """
    rbits = _BITS - p
    h = _hash52(F.col(col), salt)
    bucket = F.shiftright(h, rbits)
    w = h.bitwiseAND(F.lit((1 << rbits) - 1))
    # rank via lpad(bin()) + instr: pure integer/string ops — no float
    # log2 whose rounding at exact powers of two differs across engines
    binw = F.lpad(F.bin(w), rbits, "0")
    rho = F.when(w == 0, F.lit(rbits + 1)).otherwise(F.instr(binw, "1"))
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches (bucket-wise max) — sketch(A ∪ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def hll_estimate(sketch: DataFrame, p: int = 8) -> DataFrame:
    """One-row ``(used_buckets, estimate)`` from a sketch.

    The harmonic sum runs in scaled integers: each bucket contributes
    ``2^(rmax+1-r)`` (exact BIGINT; absent buckets ``2^(rmax+1)``), so
    the only floating arithmetic is the final constant multiply/divide —
    bit-identical across engines and aggregation orders.
    """
    m = 1 << p
    rbits = _BITS - p
    scale = 1 << (rbits + 1)
    alpha = hll_alpha(m)
    term = F.pow(F.lit(2.0), F.lit(rbits + 1) - F.col("r")).cast("bigint")
    agg = sketch.agg(
        F.sum(term).alias("s"), F.count(F.lit(1)).alias("used")
    )
    denom = (F.col("s") + (F.lit(m) - F.col("used")) * F.lit(scale)).cast("double")
    raw = F.lit(alpha * m * m * float(scale)) / denom
    zeros = F.lit(m) - F.col("used")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        F.col("used").cast("bigint").alias("used_buckets"),
        F.round(est, 2).alias("estimate"),
    )


def hll_sketch_grouped(
    df: DataFrame, col: str, group_cols, p: int = 8, salt: str = "hll"
) -> DataFrame:
    """Per-group sketch: ``(group..., bucket, r)``, at most ``2^p`` rows
    per group.  Same shuffle shape as the global sketch (one partial-max
    aggregation keyed by group+bucket); sketches for the same group from
    different batches still merge by bucket-wise max."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    rbits = _BITS - p
    h = _hash52(F.col(col), salt)
    bucket = F.shiftright(h, rbits)
    w = h.bitwiseAND(F.lit((1 << rbits) - 1))
    binw = F.lpad(F.bin(w), rbits, "0")
    rho = F.when(w == 0, F.lit(rbits + 1)).otherwise(F.instr(binw, "1"))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate_grouped(
    sketch: DataFrame, group_cols, p: int = 8
) -> DataFrame:
    """Per-group ``(group..., used_buckets, estimate)`` — the same
    scaled-integer harmonic sum as :func:`hll_estimate`, grouped."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    m = 1 << p
    rbits = _BITS - p
    scale = 1 << (rbits + 1)
    alpha = hll_alpha(m)
    term = F.pow(F.lit(2.0), F.lit(rbits + 1) - F.col("r")).cast("bigint")
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(term).alias("s"), F.count(F.lit(1)).alias("used")
    )
    denom = (F.col("s") + (F.lit(m) - F.col("used")) * F.lit(scale)).cast("double")
    raw = F.lit(alpha * m * m * float(scale)) / denom
    zeros = F.lit(m) - F.col("used")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("used").cast("bigint").alias("used_buckets"),
        F.round(est, 2).alias("estimate"),
    )


def hll_count_distinct(df: DataFrame, col: str, p: int = 8, salt: str = "hll") -> float:
    """Convenience terminal: the scalar estimate."""
    return hll_estimate(hll_sketch(df, col, p, salt), p).collect()[0]["estimate"]


# ------------------------------------------------- Count-Min sketch


def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch of value frequencies: ``(row, bucket, cnt)``
    with ``depth * width`` cells.

    Each of the ``depth`` rows hashes the value with a different salt
    into ``width`` buckets; a cell is the SUM of counts landing in it.
    The build is one grouped aggregation (map-side combinable), the
    sketch is tiny and **mergeable by cell-wise sum** — per-batch
    sketches of an unbounded stream add up to the sketch of the union,
    the same property :func:`hll_sketch` has for distincts.  Estimates
    (``cms_estimate``) are upper bounds with error ≤ 2N/width at 1-2^-d
    confidence — heavy-hitter queries over 100 TB event logs without a
    per-key exact aggregation.
    """
    # one scan: each input row fans out to its `depth` cells via explode
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                (_hash52(F.col(col), f"{salt}{d}") % width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("_c"))
        .select("_c.row", "_c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches (cell-wise sum) — sketch(A ⊎ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Estimated frequency for each distinct value in ``values[col]``:
    min over the ``depth`` cells the value hashes to.  The sketch side
    is ≤ depth*width rows — always broadcast."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                (_hash52(F.col(col), f"{salt}{d}") % width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = values.select(F.col(col), F.explode(cells).alias("_c")).select(
        col, "_c.row", "_c.bucket"
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(col).agg(F.min("cnt").alias("est_count"))


def hll_std_error(p: int) -> float:
    """Expected relative standard error of the estimate (~1.04/sqrt(m))."""
    return 1.04 / math.sqrt(1 << p)


# ------------------------------------------- HDR quantile sketch
#
# A log2-linear histogram in the HdrHistogram / DDSketch family
# (Masson, Lee, Rim: "DDSketch", VLDB 2019), built from *pure integer
# ops* so the bucket function is bit-identical across engines (no
# float log whose rounding at bucket boundaries could differ):
#
#   v       = round(x * scale)          (positive metric -> integer)
#   shift   = max(bitlen(v) - 1 - k, 0)
#   bucket  = (v >> shift) << shift     (the bucket's lower bound)
#
# Buckets are exact below 2^(k+1) and have width 2^shift above, giving
# guaranteed relative error <= 2^-k.  The sketch is the (bucket, cnt)
# table: tiny (<= ~64*2^k rows for bigint inputs), persistable, and
# mergeable by bucket-wise SUM — per-batch sketches of an unbounded
# stream add to the sketch of the union, so percentile dashboards over
# a 100 TB event log are a per-batch increment, never a global sort.


def hdr_bucket(col: Column, k: int = 7, scale: int = 1) -> Column:
    """Lower bound of the log2-linear bucket holding ``col``.

    Integer-only: bit length via ``length(bin(v))`` then shift down/up.
    Nonpositive values collapse to bucket 0 (documented: this sketch
    targets positive metrics; 0 keeps them countable).
    """
    v = F.round(col.cast("double") * F.lit(scale)).cast("bigint")
    shift = F.greatest(F.length(F.bin(v)) - F.lit(1 + k), F.lit(0)).cast("int")
    # the python shiftleft/shiftright wrappers only take int bit counts;
    # the SQL functions accept a column — call them directly
    down = F.call_function("shiftright", v, shift)
    return F.when(v <= 0, F.lit(0)).otherwise(
        F.call_function("shiftleft", down, shift)
    )


def hdr_sketch(
    df: DataFrame, col: str, k: int = 7, scale: int = 1
) -> DataFrame:
    """Build the sketch: ``(bucket, cnt)``.  One grouped count with a
    map-side partial — scan-bound at any scale."""
    return (
        df.select(hdr_bucket(F.col(col), k, scale).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches (bucket-wise sum) — sketch(A ⊎ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame, qs, scale: int = 1, decimals: int = 6
) -> DataFrame:
    """``(q, estimate)`` per requested quantile.

    rank(q) = max(ceil(q*N), 1); the estimate is the lower bound of the
    first bucket (in value order) whose cumulative count reaches the
    rank — within 2^-k of the true quantile.  The sketch is tiny, so
    the window sort and the quantile probe join are driver-scale
    cheap regardless of input size.
    """
    from pyspark.sql import Window

    cum = sketch.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
    ).withColumn("total", F.sum("cnt").over(Window.partitionBy()))
    # quantile probes as an exploded array LITERAL, not a
    # createDataFrame + broadcast crossJoin: a local-list DataFrame
    # parallelizes to defaultParallelism pickled partitions — one
    # Python-worker handshake per core for 5 rows — and the crossJoin
    # adds a BroadcastExchange.  The explode is pure JVM codegen, same
    # rows (r10).
    probe = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ).where(
        F.col("cum") >= F.greatest(
            F.ceil(F.col("q") * F.col("total")), F.lit(1)
        )
    )
    return (
        probe.groupBy("q")
        .agg(F.min("bucket").alias("_b"))
        .select(
            "q",
            F.round(F.col("_b") / F.lit(float(scale)), decimals).alias(
                "estimate"
            ),
        )
    )


def hdr_sketch_grouped(
    df: DataFrame, col: str, group_cols, k: int = 7, scale: int = 1
) -> DataFrame:
    """Per-group sketch ``(group..., bucket, cnt)`` — same shuffle shape
    keyed by group+bucket; merges per group by bucket-wise sum."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    return (
        df.select(*group_cols, hdr_bucket(F.col(col), k, scale).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles_grouped(
    sketch: DataFrame, group_cols, qs, scale: int = 1, decimals: int = 6
) -> DataFrame:
    """Per-group ``(group..., q, estimate)`` — the grouped form of
    :func:`hdr_quantiles` (cumulative window partitioned by group)."""
    from pyspark.sql import Window

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = sketch.withColumn(
        "cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    # exploded array literal, not createDataFrame + broadcast crossJoin
    # — see hdr_quantiles (r10)
    probe = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ).where(
        F.col("cum") >= F.greatest(
            F.ceil(F.col("q") * F.col("total")), F.lit(1)
        )
    )
    return (
        probe.groupBy(*group_cols, "q")
        .agg(F.min("bucket").alias("_b"))
        .select(
            *group_cols,
            "q",
            F.round(F.col("_b") / F.lit(float(scale)), decimals).alias(
                "estimate"
            ),
        )
    )


def hdr_rel_error(k: int) -> float:
    """Guaranteed relative error bound of bucket lower bounds (2^-k)."""
    return 2.0 ** -k


# ------------------------------------------------- Bloom filter
#
# A broadcastable membership sketch: the bitset is stored as a tiny
# ``(w, bits)`` table of 64-bit words (<= m/64 rows; 1 MiB of bitset =
# 16k rows), built in one grouped BIT_OR aggregation and **mergeable by
# word-wise BIT_OR**.  No false negatives ever, so it is safe as a
# *prefilter* in front of an exact anti-join: rows the bloom rejects
# are definite non-members and skip the shuffle entirely — at 100 TB
# the "dedup this crawl against the full corpus" join only shuffles
# the (tiny) fraction of new rows whose k bits all hit.


def _bloom_cells(col: Column, num_bits: int, num_hashes: int, salt: str) -> Column:
    """Array of (word index, word mask) cells for a value's k probes."""
    cells = []
    for d in range(num_hashes):
        pos = _hash52(col, f"{salt}{d}") % num_bits
        cells.append(
            F.struct(
                F.call_function("shiftright", pos, F.lit(6)).alias("w"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
                ).alias("mask"),
            )
        )
    return F.array(*cells)


def bloom_sketch(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter: ``(w, bits)`` words with the k bits of every
    value OR-ed in.  One explode + grouped BIT_OR (map-side combinable),
    scan-bound; the result is small enough to broadcast."""
    return (
        df.select(F.explode(_bloom_cells(F.col(col), num_bits, num_hashes, salt)).alias("_c"))
        .groupBy(F.col("_c.w").alias("w"))
        .agg(F.bit_or("_c.mask").alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Merge filters (word-wise OR) — filter(A ∪ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("w").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    probe: DataFrame,
    col: str,
    sketch: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """``probe`` plus a boolean ``_bloom_maybe`` column: true iff all k
    bits are set (possible member), false = certain non-member.

    The word table is materialized ONCE into a dense array literal
    (bounded: ``num_bits/64`` longs — 128 KiB of plan for a 2^20-bit
    filter) and each of the k probes is a pure ``element_at`` + bit-AND
    Column expression.  Zero joins, zero shuffles, whole-stage codegen —
    the same shape as Spark's own runtime bloom filters, which also
    collect the aggregated filter to the driver before pushing it into
    the scan.  For filters too big to ship in a plan, lower ``num_bits``
    (fp-rate tradeoff) or pre-partition both sides instead."""
    n_words = num_bits >> 6
    words = {r["w"]: r["bits"] for r in sketch.collect()}
    dense = [words.get(i, 0) for i in range(n_words)]
    # ship the bitset as ONE broadcast row holding the dense array —
    # NOT F.lit(list), which expands to a per-row CreateArray of
    # num_bits/64 child literals (measured ~3.5s of codegen/eval for a
    # 2^18-bit filter vs ~0 for the broadcast row)
    spark = probe.sparkSession
    # one explicit slice: the default local-list path parallelizes even
    # a 1-row frame to defaultParallelism pickled partitions, paying a
    # Python-worker handshake per core to produce one row (r10)
    arr_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(dense,)], 1),
        "_bloom_words array<bigint>",
    )
    out = probe.crossJoin(F.broadcast(arr_df))
    arr = F.col("_bloom_words")
    maybe = None
    for d in range(num_hashes):
        pos = _hash52(F.col(col), f"{salt}{d}") % num_bits
        w = F.call_function("shiftright", pos, F.lit(6))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        hit = F.element_at(arr, (w + 1).cast("int")).bitwiseAND(mask) == mask
        maybe = hit if maybe is None else (maybe & hit)
    return out.withColumn("_bloom_maybe", maybe).drop("_bloom_words")


def bloom_fp_rate(n: int, num_bits: int, num_hashes: int) -> float:
    """Expected false-positive rate for n inserted values."""
    return (1.0 - math.exp(-num_hashes * n / num_bits)) ** num_hashes
