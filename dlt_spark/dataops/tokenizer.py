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

import pandas as pd
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


def _pair_counts_sym(words: DataFrame) -> DataFrame:
    """Adjacent SYMBOL-pair counts over a ``(sym, freq)`` table where
    ``sym`` is a space-separated symbol string ("h e l l o"). Returns
    ``(a, b, n)`` with ``n`` = freq-weighted occurrence count."""
    syms = F.split(F.col("sym"), " ")
    return (
        words.withColumn("_sz", F.size(syms))
        .filter(F.col("_sz") >= 2)
        .select(
            "freq",
            F.split(F.col("sym"), " ").alias("_a"),
            F.explode(F.sequence(F.lit(1), F.col("_sz") - 1)).alias("i"),
        )
        .select(
            F.element_at("_a", F.col("i")).alias("a"),
            F.element_at("_a", F.col("i") + 1).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train(df: DataFrame, text_col: str = "text", merges: int = 3) -> list:
    """Train ``merges`` rounds of byte-pair-encoding merges over a
    corpus (Sennrich et al. 2016, public algorithm): words collapse to
    a ``(word, freq)`` vocabulary once, each word becomes a
    space-separated symbol string, and each round (1) counts adjacent
    symbol pairs weighted by word frequency, (2) picks the most
    frequent pair (ties -> lexicographically smallest), (3) merges it
    everywhere via two passes of non-overlapping left-to-right string
    replacement.  Two-pass replace is deterministic and engine-exact
    (both Spark and ANSI `replace` scan left-to-right consuming the
    match); for runs of >=5 repeats of the same pair inside one word
    the segmentation can differ from strict greedy BPE — irrelevant
    for the merge-table statistic and identical in the SQL oracle.

    Only lowercase alnum words participate (sidesteps engine-specific
    unicode segmentation).  Returns a list of ``merges`` dicts
    ``{rank, pair_left, pair_right, n}``.

    Scale shape: everything after the one corpus pass is
    vocabulary-sized (the classic BPE-trainer collapse) — per round
    one codegen pair-explode + one (a, b) aggregation + a 1-row
    TakeOrdered collect; the vocab frame is checkpointed per round.
    """
    words = (
        word_freq(df, text_col)
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .select(
            F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("sym"), "freq"
        )
        .localCheckpoint(eager=False)
    )
    out = []
    for r in range(1, merges + 1):
        top = (
            _pair_counts_sym(words)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        out.append({"rank": r, "pair_left": a, "pair_right": b, "n": n})
        pat, rep = f" {a} {b} ", f" {a}{b} "
        merged = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        for _ in range(2):
            merged = F.replace(merged, F.lit(pat), F.lit(rep))
        words = words.select(F.trim(merged).alias("sym"), "freq").localCheckpoint(
            eager=False
        )
    return out


#: above this many merges bpe_apply switches from the chained-replace
#: codegen path to the vocabulary-collapsed pandas-UDF path.  The chain
#: builds a Catalyst expression 2*merges deep: measured on this host the
#: analyzer + codegen stay healthy through 64 merges (see SCALE.md r8
#: probe), while a production merge table (8k-50k merges) would blow up
#: the expression tree linearly — the vocab path is the scale answer.
CHAIN_MERGE_LIMIT = 64


def _encode_tokens_udf(merges: "list[dict]"):
    """Arrow-batched word -> token-count kernel replaying the EXACT
    two-pass non-overlapping left-to-right replace the column chain and
    the trainer use (Python ``str.replace`` has identical semantics),
    so both bpe_apply paths agree bit-for-bit."""
    pairs = [(m["pair_left"], m["pair_right"]) for m in merges]

    @F.pandas_udf("int")
    def _encode(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            s = " " + " ".join(w) + " "
            for a, b in pairs:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                s = s.replace(pat, rep).replace(pat, rep)
            out.append(len(s.split()))
        return pd.Series(out, dtype="int32")

    return _encode


def bpe_apply(
    df: DataFrame,
    merges: "list[dict]",
    id_col: str = "doc_id",
    text_col: str = "text",
    chain_merge_limit: int = CHAIN_MERGE_LIMIT,
) -> DataFrame:
    """Encode the corpus with a trained BPE merge table (the other half
    of :func:`bpe_train` — together they are the train -> tokenize loop
    a data pipeline runs before packing): every lowercase-alnum word
    occurrence becomes its symbol segmentation after applying the
    merges in rank order, and the per-document token accounting falls
    out (``n_words``, ``n_tokens``, ``tokens_per_word``).

    Two physical strategies, picked by merge-table size:

    - ``len(merges) <= chain_merge_limit``: each merge applies as the
      same two-pass non-overlapping left-to-right ``replace`` the
      trainer uses — a chain of ``2 * len(merges)`` codegen string ops
      per word occurrence, zero Python, zero extra shuffle.  The chain
      is merge-LINEAR in Catalyst expression depth, so it is capped
      (measured healthy through 64 merges; see ``CHAIN_MERGE_LIMIT``).
    - above the cap: the vocabulary collapse every real tokenizer
      exploits — DISTINCT words (vocab-sized, corpus-independent) run
      the real merge loop in ONE Arrow-batched pandas UDF whose cost is
      merges x vocab, then token counts join back to occurrences on the
      word key (AQE broadcasts the vocab side when small).  An 8k-50k
      production merge table is O(1) in plan size on this path.

    Both paths replay identical replace semantics and agree exactly
    (property-tested at merges >= 64).  Engine-exact: the SQL oracle
    replays the same chain.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    if len(merges) <= chain_merge_limit:
        sym = F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace("word", "(.)", "$1 ")),
            F.lit(" "),
        )
        for m in merges:
            pat = f" {m['pair_left']} {m['pair_right']} "
            rep = f" {m['pair_left']}{m['pair_right']} "
            for _ in range(2):
                sym = F.replace(sym, F.lit(pat), F.lit(rep))
        toks = F.size(F.split(F.trim(sym), " "))
        counted = words.select(F.col(id_col), toks.alias("_t"))
    else:
        encode = _encode_tokens_udf(merges)
        vocab = words.select("word").distinct().select(
            "word", encode("word").alias("_t")
        )
        counted = words.join(vocab, "word").select(F.col(id_col), "_t")
    return (
        counted
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_t").alias("n_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
                9,
            ).alias("tokens_per_word"),
        )
        .orderBy(id_col)
    )
