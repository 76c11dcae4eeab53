"""Corpus-level unigram language-model scoring (perplexity proxy).

A standard training-data quality signal (used by CCNet/Gopher-style
pipelines as a cheap stand-in for a real LM): fit a unigram model on the
corpus itself and score every document by its average negative log
probability.  High scores = rare-token-heavy documents (boilerplate,
code dumps, non-language noise); low scores = stopword soup.

Scale design (100 TB):

- One explode pass reduced immediately to per-(doc, token) counts, so
  downstream stages carry term frequencies, not raw token instances.
- The vocabulary is DERIVED from that same reduced table (an
  aggregation over |doc x distinct-token| rows) — the corpus text is
  tokenized exactly once (the tf table is locally checkpointed, same
  pattern as the MinHash shingle index).
- The score join is on the token key, which is Zipf-skewed ("the" is in
  every doc).  The head of the vocabulary (freq >= ``head_min_freq``)
  is split out and broadcast — hot keys never shuffle — while the long
  tail (bounded per-key fan-out by definition) takes the shuffle join.
- Log-probabilities are rounded to 9 decimals and summed as decimals so
  partial-aggregation order cannot change the result (the DuckDB oracle
  reproduces them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, token) term frequencies; lower-cased whitespace tokens.
    SQL: ``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_min_freq: int = 1000,
) -> DataFrame:
    """Score each document by its average unigram negative log prob.

    Returns ``(id_col, n_toks, avg_neg_logp)``.  ``head_min_freq``
    controls the broadcast-head / shuffle-tail split of the vocabulary:
    tokens with corpus frequency >= the threshold join broadcast (the
    Zipf head is small by construction), the rest shuffle.
    """
    # tf table feeds three branches (vocab + two joins) — checkpoint it
    # once instead of re-tokenizing the corpus per branch
    dt = doc_term_freq(df, id_col, text_col).localCheckpoint(eager=False)
    vocab = dt.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    # integer nano-logs: every downstream sum/divide is exact integer
    # arithmetic, so the result is bit-identical across engines and
    # partial-aggregation orders (a float round(x/n, 6) sits on half
    # boundaries whenever n is small — exact integer HALF_UP instead)
    nlogp = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
        * F.lit(1000000000.0)
    ).cast("bigint")
    head_v = (
        vocab.filter(F.col("cnt") >= head_min_freq)
        .join(F.broadcast(total))
        .select("token", nlogp.alias("nlogp9"))
    )
    tail_v = (
        vocab.filter(F.col("cnt") < head_min_freq)
        .join(F.broadcast(total))
        .select("token", nlogp.alias("nlogp9"))
    )
    scored = dt.join(F.broadcast(head_v), "token").unionByName(dt.join(tail_v, "token"))
    agg = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_toks"),
        F.sum(F.col("tf") * F.col("nlogp9")).alias("num9"),
    )
    # round-half-up to 6 decimals in pure integers:
    #   avg = num9 / (n_toks * 1e9);  micro = (2*num9 + n*1000) div (2*n*1000)
    return agg.select(
        id_col,
        "n_toks",
        (
            F.expr("(2 * num9 + n_toks * 1000) div (2 * n_toks * 1000)").cast("double")
            / F.lit(1000000.0)
        ).alias("avg_neg_logp"),
    )


def vocab_coverage(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 1000
) -> DataFrame:
    """Top-``top_k`` corpus vocabulary with cumulative coverage: the
    tokenizer-training question "how many types cover 95% of tokens".

    Returns ``(rank, token, cnt, coverage)`` with coverage = cumulative
    token mass of ranks 1..r over the total corpus token count.

    Scale shape: the (already reduced) tf table aggregates to the vocab;
    the corpus total is one scalar aggregate; the top-k selection is a
    TakeOrdered (per-partition heaps, no global sort of the vocabulary);
    only the k surviving rows enter the ranking window.  Ties order by
    token so every stage is deterministic."""
    dt = doc_term_freq(df, id_col, text_col)
    vocab = dt.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    top = vocab.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_k)

    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "coverage",
            F.round(
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("_total"),
                9,
            ),
        )
        .select("rank", "token", "cnt", "coverage")
    )


def doc_bigram_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, w1, w2) bigram frequencies, without a positions window:
    the bigram list is built inside the token array (``transform`` over
    the tail zipping each token with its predecessor) and exploded
    already-paired, so no per-doc sort/lag shuffle ever happens.
    SQL twin: unnest WITH ORDINALITY + lag() per doc (the oracle can
    afford the window; the engine side stays narrow)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pairs = F.expr(
        "transform(slice(_tk, 2, greatest(size(_tk) - 1, 0)),"
        " (t, i) -> struct(_tk[i] as w1, t as w2))"
    )
    return (
        df.select(F.col(id_col), toks.alias("_tk"))
        .filter(F.size("_tk") >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_bg"))
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("tf"))
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    head_min_freq: int = 1000,
) -> DataFrame:
    """Per-doc average negative log P(w2|w1) under a corpus-fit bigram
    model with add-k smoothing: ``-ln((c(w1,w2)+k) / (c(w1)+k*V))``
    where V is the unigram vocabulary size.  The next quality rung above
    :func:`unigram_logprob` — word-order-scrambled or template-stitched
    text scores badly here while passing the unigram screen.

    Scale design mirrors unigram_logprob: the corpus is tokenized to
    bigrams ONCE (checkpointed doc-bigram tf), the model tables derive
    from that same reduced table, the conditional-probability join keys
    on (w1, w2) with the Zipf head (``c(w1,w2) >= head_min_freq``) split
    out and broadcast so hot bigrams ("of the") never shuffle, and the
    per-doc sums run on integer nano-logs so partial-aggregation order
    cannot change a single bit of the result.

    Returns ``(id_col, n_bigrams, avg_neg_logp)``.
    """
    dbt = doc_bigram_freq(df, id_col, text_col).localCheckpoint(eager=False)
    bigrams = dbt.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    unigrams = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V = distinct unigram types over the whole corpus (first tokens of
    # bigrams miss the final token of each doc; count the true vocab)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    vsize = (
        df.select(F.explode(toks).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    nlogp = F.round(
        -F.log(
            (F.col("c12").cast("double") + F.lit(add_k))
            / (F.col("c1").cast("double") + F.lit(add_k) * F.col("v").cast("double"))
        )
        * F.lit(1000000000.0)
    ).cast("bigint")
    model = bigrams.join(unigrams, "w1").join(F.broadcast(vsize))
    head = model.filter(F.col("c12") >= head_min_freq).select(
        "w1", "w2", nlogp.alias("nlogp9")
    )
    tail = model.filter(F.col("c12") < head_min_freq).select(
        "w1", "w2", nlogp.alias("nlogp9")
    )
    scored = dbt.join(F.broadcast(head), ["w1", "w2"]).unionByName(
        dbt.join(tail, ["w1", "w2"])
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("nlogp9")).alias("num9"),
    )
    # integer round-half-up to 6 decimals — see unigram_logprob
    return agg.select(
        id_col,
        "n_bigrams",
        (
            F.expr("(2 * num9 + n_bigrams * 1000) div (2 * n_bigrams * 1000)").cast(
                "double"
            )
            / F.lit(1000000.0)
        ).alias("avg_neg_logp"),
    )


def dsir_logratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    head_min_freq: int = 1000,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the unigram log-likelihood ratio between a TARGET
    distribution (rows where boolean ``target_col`` is true — e.g. a
    high-quality seed set) and the SOURCE distribution (the rest of the
    corpus).  High scores = documents that look like the target;
    importance resampling then keeps a weighted sample (compose with
    :mod:`..sampling` — e.g. ``weighted_sample_k`` over the weights).

    Returns ``(id_col, n_toks, dsir_nano)`` where ``dsir_nano`` is
    ``sum_f tf(f) * (ln p_target(f) - ln p_source(f))`` in integer
    nano-units (add-1 smoothing over the joint vocabulary; per-token
    ratios quantized to nanos BEFORE the sum, so the aggregate is exact
    bigint arithmetic in any order — bit-identical to the SQL oracle).

    Scale shape: the corpus is tokenized ONCE (shared tf table,
    locally checkpointed); both distributions come from one grouped
    aggregation with a conditional sum; the score join splits the
    Zipf head (broadcast) from the tail (shuffle), same as
    :func:`unigram_logprob`.
    """
    flags = df.select(
        F.col(id_col), F.col(target_col).cast("boolean").alias("_is_target")
    )
    dt = (
        doc_term_freq(df, id_col, text_col)
        .join(flags, id_col)
        .localCheckpoint(eager=False)
    )
    counts = dt.groupBy("token").agg(
        F.sum("tf").alias("c_all"),
        F.sum(F.when(F.col("_is_target"), F.col("tf")).otherwise(0)).alias("c_t"),
    )
    totals = counts.agg(
        F.sum("c_all").alias("n_all"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    p_t = (F.col("c_t") + 1).cast("double") / (F.col("n_t") + F.col("v")).cast("double")
    p_s = (F.col("c_all") - F.col("c_t") + 1).cast("double") / (
        F.col("n_all") - F.col("n_t") + F.col("v")
    ).cast("double")
    delta = F.round((F.log(p_t) - F.log(p_s)) * F.lit(1000000000.0)).cast("bigint")
    head_c = (
        counts.filter(F.col("c_all") >= head_min_freq)
        .join(F.broadcast(totals))
        .select("token", delta.alias("delta_nano"))
    )
    tail_c = (
        counts.filter(F.col("c_all") < head_min_freq)
        .join(F.broadcast(totals))
        .select("token", delta.alias("delta_nano"))
    )
    scored = dt.join(F.broadcast(head_c), "token").unionByName(
        dt.join(tail_c, "token")
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_toks"),
        F.sum(F.col("tf") * F.col("delta_nano")).alias("dsir_nano"),
    )
