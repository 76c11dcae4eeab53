"""Text analysis operators for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting.  Everything is
a ``Column`` expression built from ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen, zero Python in the hot path — so a 100 TB documents
scan runs at I/O speed.  Each helper has an exact ANSI-SQL equivalent
(documented inline) used by the DuckDB oracle in ``__spark_entry__``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID (deterministic, dependency-free)
STOPWORDS: Dict[str, tuple] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization.  SQL: ``regexp_split_to_array(trim(text), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """SQL: ``len(regexp_split_to_array(trim(text), '\\s+'))``."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND
    letter/digit/punct boundaries (a cheap BPE proxy).
    SQL: ``len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))``."""
    return F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"))


def unique_token_ratio(text: Column, decimals: int = 6) -> Column:
    """Lexical diversity — distinct/total tokens, rounded for cross-engine
    float stability.
    SQL: ``round(len(list_distinct(toks)) / len(toks), 6)``."""
    t = tokens(text)
    return F.round(F.size(F.array_distinct(t)) / F.size(t), decimals)


def mean_token_length(text: Column, decimals: int = 6) -> Column:
    """SQL: ``round(len(array_to_string(toks,'')) / len(toks), 6)``."""
    t = tokens(text)
    return F.round(
        F.length(F.array_join(t, "")) / F.size(t), decimals
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens in the language's stopword list.
    SQL: ``len(list_filter(toks, t -> t IN (...)))``."""
    words = STOPWORDS[lang]
    t = tokens(F.lower(text))
    return F.size(F.filter(t, lambda x: x.isin(*words)))


def lang_id(text: Column) -> Column:
    """Stopword-overlap language ID over the built-in lists; ties resolve
    by fixed language order (en, de, es, fr), 'und' when no hits.
    Deterministic and SQL-expressible (CASE over the per-language scores).
    """
    scores = {lang: stopword_hits(text, lang) for lang in ("en", "de", "es", "fr")}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in ("fr", "es", "de", "en"):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(text: Column, decimals: int = 6) -> Column:
    """Punctuation chars / total chars.
    SQL: ``round(len(regexp_extract_all(text,'[^a-zA-Z0-9\\s]')) / length(text), 6)``."""
    return F.round(
        F.size(F.expr(r"regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0)")) / F.length(text),
        decimals,
    )


def quality_score(text: Column, decimals: int = 6) -> Column:
    """Composite quality heuristic in [0,1]: rewards lexical diversity and
    mid-range document length, penalizes punctuation soup.  A deterministic
    arithmetic formula (C4/Gopher-style rule scoring), exactly expressible
    in SQL for the oracle."""
    n = token_count(text)
    diversity = F.size(F.array_distinct(tokens(text))) / n
    length_ok = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    punct = F.size(F.expr(r"regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0)")) / F.length(text)
    return F.round(diversity * 0.5 + length_ok * 0.4 + (1.0 - punct) * 0.1, decimals)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: sha256 hex of the whitespace-normalized,
    lowercased text.  SQL: ``sha256(array_to_string(regexp_split_to_array(
    trim(lower(text)),'\\s+'),' '))``."""
    normalized = F.array_join(tokens(F.lower(text)), " ")
    return F.sha2(normalized, 256)


def rolling_hash_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min over rolling sha-based hashes of
    `window`-grams — robust to local edits.  SQL-expressible via
    list_transform + list_min over generate_series."""
    t = tokens(F.lower(text))
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1))),
        lambda i: F.array_join(F.slice(t, i, window), " "),
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.sha2(g, 256), 1, 15), 16, 10).cast("bigint"),
    )
    return F.array_min(hashes)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF.

    Plan: explode tokens -> per-(doc,term) counts (one shuffle) ->
    document frequency per term (second aggregation over the same
    exchange) -> join the term-df table back -> windowed top-k per doc.
    The df join is deliberately NOT broadcast-hinted: the term table is
    vocabulary-sized (billions of distinct tokens on a web corpus), so a
    forced broadcast OOMs the driver at scale — AQE picks broadcast on
    its own whenever the vocab actually fits under
    ``spark.sql.autoBroadcastJoinThreshold``.  ``idf = ln(N/df)``; score
    rounded for cross-engine float stability.  SQL-oracle expressible
    end to end."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), decimals),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, "term", F.col("tf").cast("bigint").alias("tf"), "tfidf",
                F.col("rnk").cast("bigint").alias("rnk"))
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    languages: Optional[Sequence[str]] = None,
    near_dedup: bool = True,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """The composed training-data curation pipeline: exact dedup ->
    quality/length/language filters -> optional MinHash near-dedup.
    Each stage is one of the individually oracle-verified operators;
    the composition is one narrow pass + the dedup shuffles."""
    from .dedup import drop_exact_dups, minhash_dedup

    c = F.col(text_col)
    out = drop_exact_dups(df, id_col, text_col)
    out = out.filter(
        (token_count(c) >= min_tokens)
        & (token_count(c) <= max_tokens)
        & (quality_score(c) >= min_quality)
    )
    if languages:
        out = out.filter(lang_id(c).isin(*languages))
    if near_dedup:
        # materialize the filtered corpus once before the multi-pass
        # near-dedup: the dedup consumes it several times (signatures,
        # verification shingles, final anti-join), and truncating the
        # lineage here also keeps each downstream job's plan small.  At
        # cluster scale this is the "write the curated staging table"
        # step of a multi-pass dedup pipeline; localCheckpoint is the
        # local-mode analog (swap for a real staging-table write when a
        # persistent store is bound).
        out = out.localCheckpoint(eager=True)
        out = minhash_dedup(
            out, id_col, text_col, shingle_n=shingle_n,
            jaccard_threshold=jaccard_threshold,
        )
    return out


def add_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach all metrics as columns in a single projection."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "uniq_ratio": unique_token_ratio(c),
            "mean_tok_len": mean_token_length(c),
            "punct_ratio": punct_ratio(c),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )
