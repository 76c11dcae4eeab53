"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "concat-and-chunk" step of every LLM pre-training
pipeline).

Documents are concatenated in a deterministic order and cut into
``seq_len``-token sequences; each document learns which sequence its
first token lands in and at what offset.  The reference engine has no
such operator — beyond-reference dataop (SURVEY §2.L).

Scale design (100 TB): a single global concatenation order would be one
total sort — the classic non-scalable formulation.  Real pipelines shard
first and pack per shard; we do the same:

- each doc is hashed to one of ``num_shards`` shards (sha256-based, so
  the assignment is partition/retry/engine independent — same recipe as
  :mod:`dlt_spark.dataops.sampling`);
- within a shard, docs are ordered by id and token counts are
  cumulative-summed with a window *partitioned by shard* — Spark sorts
  each shard independently in parallel, no global sort, one shuffle;
- sequence ids are ``(shard, floor(cum_before / seq_len))``, globally
  unique as ``shard * 2^40 + local_seq``.

Integer arithmetic end-to-end — bit-identical across engines (the
DuckDB oracle reproduces it as one window SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEQ_SHIFT = 1 << 40  # local seq ids fit comfortably below this


def shard_of(key, num_shards: int):
    """Deterministic shard id from a key column: first 13 hex chars of
    sha256 (52 bits, exact in a double/bigint) mod ``num_shards``.
    SQL: ``CAST(('0x' || substr(sha256(CAST(k AS VARCHAR)), 1, 13)) AS
    BIGINT) % num_shards``."""
    h = F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 13), 16, 10)
    return (h.cast("bigint") % num_shards).alias("shard")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    seq_len: int = 2048,
    num_shards: int = 32,
) -> DataFrame:
    """Assign every document a training-sequence id and token offset.

    ``token_count_col`` is a column name or Column with the document's
    token count.  Output columns: ``id, shard, n_tokens, begin_seq``
    (global sequence id of the doc's first token), ``begin_offset``
    (offset of that token within the sequence), ``end_seq`` (sequence of
    the last token — docs longer than the remaining budget straddle
    sequences, exactly like training-time chunking).
    """
    toks = F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    # clamp to >= 1: a zero/NULL-token document at cum_before=0 would make
    # end_seq = shard*SHIFT - 1, straddling shard namespaces (and blowing
    # up sequences_needed); a degenerate doc still occupies one token slot
    base = df.select(
        F.col(id_col).alias("id"),
        shard_of(F.col(id_col), num_shards),
        F.greatest(F.coalesce(toks.cast("bigint"), F.lit(1)), F.lit(1)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("cum_before")
    out = base.withColumn("cum_before", start).withColumn("cum_end", cum)
    return out.select(
        "id",
        "shard",
        "n_tokens",
        (F.col("shard") * _SEQ_SHIFT + F.floor(F.col("cum_before") / seq_len)).alias(
            "begin_seq"
        ),
        (F.col("cum_before") % seq_len).alias("begin_offset"),
        (
            F.col("shard") * _SEQ_SHIFT + F.floor((F.col("cum_end") - 1) / seq_len)
        ).alias("end_seq"),
    )


def sequences_needed(packed: DataFrame) -> DataFrame:
    """Per-shard sequence counts from :func:`pack_sequences` output —
    the sizing summary a training job reads."""
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.max(F.col("end_seq") % _SEQ_SHIFT) + 1).alias("sequences"),
    )


def length_buckets(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    boundaries: "list[int]",
    batch_tokens: int = 16384,
    salt: str = "lenbatch",
) -> DataFrame:
    """Length-bucketed batch assignment — the dynamic-batching step that
    keeps padding waste bounded: documents are grouped into buckets by
    token length (``boundaries`` = inclusive upper edges; longer docs
    land in an overflow bucket capped at the max boundary by
    truncation-at-train-time convention), and each bucket is cut into
    batches of ``batch_tokens // bucket_cap`` documents.

    Returns ``(id, n_tokens, bucket, cap, batch_in_bucket)``.  Document
    order within a bucket is the sha-hash order of the id (partition-
    layout / retry / engine independent — the same determinism recipe as
    :func:`shard_of`); all arithmetic is integer.

    Scale shape: bucket assignment is a codegen CASE chain; the batch
    index is one row_number window PARTITIONED BY bucket — parallel
    across buckets, no global sort."""
    if not boundaries or sorted(boundaries) != list(boundaries):
        raise ValueError("boundaries must be a non-empty ascending list")
    from pyspark.sql import Window

    n = F.coalesce(F.col(token_count_col).cast("bigint"), F.lit(1))
    bucket = None
    for i, b in enumerate(boundaries):
        cond = n <= b
        bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    bucket = bucket.otherwise(len(boundaries) - 1).cast("int")
    caps = F.array(*[F.lit(b) for b in boundaries])
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")), 256), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    base = df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        bucket.alias("bucket"),
        h.alias("_h"),
    ).withColumn("cap", F.element_at(caps, F.col("bucket") + 1).cast("bigint"))
    w = Window.partitionBy("bucket").orderBy("_h", "id")
    return (
        base.withColumn("_r", (F.row_number().over(w) - 1).cast("bigint"))
        .withColumn(
            "batch_in_bucket",
            F.expr(f"_r div greatest({batch_tokens}L div cap, 1L)"),
        )
        .drop("_h", "_r")
    )
