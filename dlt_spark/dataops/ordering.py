"""Deterministic training-data ordering: epoch shuffle + shard export.

A training run wants the corpus in a pseudo-random order that is (a)
different every epoch, (b) reproducible bit-for-bit across reruns and
engines, and (c) computable without a global sort.  The standard trick
(e.g. webdataset-style loaders) is to key-order by a seeded hash:
``sha256(seed:epoch:doc_id)`` is the permutation, its top bits pick the
shard, and the rank of the hash *within* the shard is the read position.

Scale design (100 TB):

- No global sort.  The only wide exchange is the hash-partition on
  ``shard`` — exactly the exchange the shard files need anyway — and
  the within-shard ordering is a per-partition sort that spills.
- ``n_shards`` should scale with the corpus (target shard ≈ a few GB),
  so per-shard sorts stay bounded; shard assignment is uniform by
  construction (cryptographic hash), so no shard skews.
- Re-running an epoch, on any cluster layout, yields the identical
  (shard, pos) for every document — the order is a pure function of
  (seed, epoch, key), never of partitioning or execution order.
- The manifest aggregation is mergeable (count/sum/bit_xor partials),
  one map-side-combined shuffle over shard keys; the xor checksum is
  order-independent so it verifies a shard regardless of write order.

The reference has no training-export concept; this extends the engine
toward the LLM-pipeline story (SURVEY §2 "beyond-reference" ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 13 hex digits = 52 bits: exact in a double AND in a BIGINT, and the
# same substring trick works verbatim in the DuckDB oracle
_HEX_BITS = 13


def _perm_hash(key: Column, epoch: int, seed: str) -> Column:
    """The permutation key: ``sha256('{seed}:{epoch}:' || key)``.
    SQL: ``sha256('{seed}:{epoch}:' || CAST(k AS VARCHAR))``."""
    return F.sha2(F.concat(F.lit(f"{seed}:{epoch}:"), key.cast("string")), 256)


def epoch_shuffle(
    df: DataFrame,
    key: str,
    n_shards: int,
    epoch: int = 0,
    seed: str = "shuffle",
) -> DataFrame:
    """Assign every row a deterministic ``(shard, pos)`` for one epoch.

    Returns the input columns plus ``epoch``, ``shard`` (0..n_shards-1)
    and ``pos`` (1-based read position within the shard).  The full
    epoch order is ``ORDER BY shard, pos``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _perm_hash(F.col(key), epoch, seed)
    hbits = F.conv(F.substring(h, 1, _HEX_BITS), 16, 10).cast("bigint")
    out = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(hbits, F.lit(n_shards)).cast("int")
    )
    # within-shard rank: per-partition sort (spills), no global exchange
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(key))
    return (
        out.withColumn("pos", F.row_number().over(w))
        .withColumn("epoch", F.lit(epoch))
        .drop("_h")
    )


def shard_manifest(
    shuffled: DataFrame,
    key: str,
    size_col: str,
    epoch: int = 0,
    seed: str = "shuffle",
) -> DataFrame:
    """One row per shard of an :func:`epoch_shuffle` result:
    ``(epoch, shard, n_docs, total_size, checksum)``.

    ``checksum`` is the bit-xor of every member's 52-bit permutation
    hash — order-independent, mergeable, and recomputable by any engine
    from (seed, epoch, keys) alone, so a reader can verify a shard's
    membership without trusting the writer.
    """
    hbits = F.conv(
        F.substring(_perm_hash(F.col(key), epoch, seed), 1, _HEX_BITS), 16, 10
    ).cast("bigint")
    return (
        shuffled.withColumn("_hb", hbits)
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(size_col)).alias("total_size"),
            F.expr("bit_xor(_hb)").alias("checksum"),
        )
    )

