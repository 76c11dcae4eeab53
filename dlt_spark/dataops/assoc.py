"""Association mining: pointwise mutual information over co-occurring
tokens.

Collocation / word-association statistics (NPMI, Bouma 2009) are a
standard corpus-analysis signal: phrase discovery for tokenizer vocab
seeding, topic drift checks, and retrieval-query expansion.  The
reference engine has no such operator — beyond-reference dataop
(SURVEY §2.L).

Scale design (100 TB):

- The corpus collapses ONCE to a per-(doc, token) DISTINCT table; pair
  enumeration is the inverted-index self-join on the doc key — the same
  shape as n-gram Jaccard — with the fan-out bounded by a document
  frequency floor (``min_count``): rare tokens (the Zipf tail, the vast
  majority) never enter the join, and per-doc distinct-token counts cap
  the quadratic term.
- All probabilities derive from exact BIGINT counts; the log ratio is
  quantized to integer nanos per pair (one scalar op), so ranking and
  output are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` token pairs by normalized PMI.

    Returns ``(token_a, token_b, n_ab, n_a, n_b, npmi_nano)`` where
    ``npmi = ln(n_ab * n_docs / (n_a * n_b)) / ln(n_docs / n_ab)`` over
    document frequencies (presence, not term frequency — the standard
    collocation formulation), quantized to integer nano-units.  Ties
    break on the pair, so the top-k cut is total-ordered.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    dt = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_doc"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_docs = dt.agg(F.countDistinct("_doc").alias("n_docs"))
    freq = (
        dt.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    kept = dt.join(freq.select("token"), "token", "left_semi")
    pairs = (
        kept.select("_doc", F.col("token").alias("token_a"))
        .join(kept.select("_doc", F.col("token").alias("token_b")), "_doc")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    scored = (
        pairs.join(freq.select(F.col("token").alias("token_a"), F.col("n").alias("n_a")), "token_a")
        .join(freq.select(F.col("token").alias("token_b"), F.col("n").alias("n_b")), "token_b")
        .join(F.broadcast(n_docs))
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.col("n_docs").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    denom = F.log(F.col("n_docs").cast("double") / F.col("n_ab").cast("double"))
    # a pair present in EVERY doc has ln(n_docs/n_ab) = 0; NPMI is 1 by
    # convention (perfect association) — guard the 0/0
    npmi_nano = F.when(
        F.col("n_ab") == F.col("n_docs"), F.lit(1000000000).cast("bigint")
    ).otherwise(F.round(pmi / denom * F.lit(1000000000.0)).cast("bigint"))
    return (
        scored.select("token_a", "token_b", "n_ab", "n_a", "n_b", npmi_nano.alias("npmi_nano"))
        .orderBy(F.col("npmi_nano").desc(), "token_a", "token_b")
        .limit(top_k)
    )


def skipgram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    top_k: int = 200,
) -> DataFrame:
    """Skip-gram co-occurrence counts within a ±``window`` token
    distance — the word2vec/GloVe preprocessing statistic.  Returns the
    ``top_k`` unordered pairs ``(token_a, token_b, n)`` with
    ``n >= min_count`` (ties break on the pair).

    Scale design: pairs are generated per offset ``d`` by zipping each
    document's token array with itself shifted ``d`` — pure Column work
    (slice + arrays_zip + explode), NO self-join and no positions
    table; total fan-out is exactly ``tokens × window``, independent of
    document count skew.  One shuffle on the pair key; TakeOrdered for
    the top-k cut."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(toks.alias("_t"))
        .filter(F.size("_t") >= 2)
    )
    branches = []
    for d in range(1, window + 1):
        n_pairs = F.size("_t") - d
        z = F.arrays_zip(
            F.slice(F.col("_t"), 1, F.greatest(n_pairs, F.lit(0))),
            F.slice(F.col("_t"), d + 1, F.greatest(n_pairs, F.lit(0))),
        )
        branches.append(
            base.filter(F.size("_t") > d)
            .select(F.explode(z).alias("_p"))
            .select(
                F.least(F.col("_p.0"), F.col("_p.1")).alias("token_a"),
                F.greatest(F.col("_p.0"), F.col("_p.1")).alias("token_b"),
            )
        )
    pairs = branches[0]
    for b in branches[1:]:
        pairs = pairs.unionAll(b)
    counted = (
        pairs.filter((F.col("token_a") != "") & (F.col("token_b") != ""))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    return counted.orderBy(F.col("n").desc(), "token_a", "token_b").limit(top_k)
