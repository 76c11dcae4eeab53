"""Tokenizer-training support: corpus word frequencies and BPE pair
statistics.

Training a BPE/WordPiece tokenizer over a 100 TB corpus starts with two
corpus-wide aggregations: the word-frequency table and the adjacent
symbol-pair frequency table (the quantity BPE's merge selection
maximizes).  The reference engine has no such operator —
beyond-reference dataop (SURVEY §2.L).

Scale design:

- The corpus is tokenized ONCE into a ``(word, freq)`` table — one
  explode + one shuffle on the word key.  Everything downstream
  (pair counts, merge ranking) runs over DISTINCT words weighted by
  frequency: cost ∝ |vocabulary|, not corpus size — the same collapse
  every real BPE trainer (e.g. the original Sennrich implementation)
  relies on.
- Pair extraction is pure Column work (``sequence`` + ``substring``)
  inside whole-stage codegen; the pair aggregation shuffles
  |vocab| × avg_word_len rows, independent of corpus row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, freq)`` — lower-cased
    whitespace tokens, empties dropped.  The single full-corpus pass."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent character-pair frequencies over a ``(word, freq)``
    table: ``(pair, n)`` where ``n`` sums word frequencies over every
    occurrence of the pair inside the word — the statistic the first
    BPE merge round ranks (subsequent rounds re-run this over the
    merged symbol sequences).
    """
    pos = F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i")
    return (
        words.filter(F.length("word") >= 2)
        .select("word", "freq", pos)
        .select(F.expr("substring(word, i, 2)").alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def top_bpe_pairs(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-``k`` BPE merge candidates for a corpus: ``(pair, n, rank)``
    ranked by pair frequency (ties broken lexicographically, so the
    ranking is total and engine-independent)."""
    from pyspark.sql import Window

    pairs = bpe_pair_counts(word_freq(df, text_col))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heap + merge, no global sort); the rank window then runs over the
    # k surviving rows only — never the full pair table
    topk = pairs.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return topk.withColumn("rank", F.row_number().over(w))
