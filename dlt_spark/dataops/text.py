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


def kernel_width(df: DataFrame) -> int:
    """Cluster-knob-derived width for a CPU-heavy kernel stage: the
    session's configured shuffle width (never a hard-coded core count,
    so the driver's low-core bench and a 1000-executor cluster each get
    their own right value)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def scale_out_narrow_scan(df: DataFrame) -> DataFrame:
    """Spread a NARROW source across the cluster before a CPU-heavy
    per-row kernel (guide §2.5 input skew: a single unsplittable file —
    and a single parquet ROW GROUP is unsplittable no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say — serializes the whole
    scan stage; "repartition immediately after the read").

    The repartition fires only when the planned scan width is below
    half the configured shuffle width, so at corpus scale (many files /
    row groups → scan width ≥ cluster width) this adds NO shuffle; on a
    narrow source it turns a 1-task explode/UDF stage into a full-width
    one for the price of shuffling the compact input once.  Scan
    partitioning is file-split based (AQE never coalesces it), so the
    pre-execution partition count is the true stage width."""
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    width = kernel_width(df)
    if cur * 2 >= width:
        return df
    return df.repartition(width)


def scale_out_staging(df: DataFrame) -> DataFrame:
    """Explicit full-width repartition for a multi-consumer staging
    materialization (checkpoint / staging table).  Post-shuffle
    intermediates that are byte-narrow get AQE-coalesced to ~1
    partition, which then serializes the materialization and every
    CPU-heavy kernel that reads it; a NUMBERED repartition is honored
    by AQE (same dial as ``graph._fanout_width``).  At cluster scale
    laying a staging table out at cluster width is the standard call."""
    return df.repartition(kernel_width(df))


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
        # persistent store is bound).  Explicit full-width repartition
        # first (r10): the filtered corpus is byte-narrow after the
        # fingerprint-window shuffle, so AQE coalesces it to ~1
        # partition — which then serializes the checkpoint
        # materialization AND every downstream minhash/shingle kernel
        # that reads it (see scale_out_staging).
        out = scale_out_staging(out)
        out = out.localCheckpoint(eager=False)  # lazy — see dedup._sig_to_buckets (r10)
        out = minhash_dedup(
            out, id_col, text_col, shingle_n=shingle_n,
            jaccard_threshold=jaccard_threshold,
        )
    return out


# ---------------------------------------------------- repetition signals
# Gopher-style repetition measures (Rae et al. 2021 "Scaling Language
# Models", table A1): heavily-repetitive documents are low-quality
# training data.  All pure Column exprs — map-side only, no shuffle, so
# they run at scan speed over a 100 TB corpus.


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (unlike :func:`dedup.shingles`,
    which dedups for set-Jaccard).  SQL: ``list_transform(
    generate_series(1, greatest(len(toks)-n+1, 1)),
    i -> array_to_string(list_slice(toks, i, i+n-1), ' '))``."""
    t = tokens(F.lower(text))
    cnt = F.greatest(F.size(t) - n + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), cnt), lambda i: F.array_join(F.slice(t, i, n), " ")
    )


def dup_line_fraction(text: Column, decimals: int = 6) -> Column:
    """Fraction of duplicate lines: ``(total - distinct) / total`` over
    newline-split lines.  SQL: same over ``string_split(text, chr(10))``."""
    lines = F.split(text, r"\n")
    return F.round(
        (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines), decimals
    )


def dup_ngram_fraction(text: Column, n: int = 2, decimals: int = 6) -> Column:
    """Fraction of duplicate word n-grams: ``(total - distinct)/total``."""
    g = word_ngrams(text, n)
    return F.round(
        (F.size(g) - F.size(F.array_distinct(g))) / F.size(g), decimals
    )


def top_ngram_fraction(text: Column, n: int = 2, decimals: int = 6) -> Column:
    """Fraction of tokens covered by the single most frequent n-gram:
    ``max_count * n / token_count``.

    The max count is a sorted-run scan — ``array_sort`` then one
    ``aggregate`` pass tracking (prev, run, best) — O(m log m) per doc
    inside codegen, instead of the O(m^2) count-each-distinct form (the
    oracle uses the quadratic form, which is fine at oracle scale)."""
    sng = F.array_sort(word_ngrams(text, n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(sng, init, step)["best"]
    return F.round(best * n / token_count(text), decimals)


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the repetition columns in one projection."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "dup_line_frac": dup_line_fraction(c),
            "dup_2gram_frac": dup_ngram_fraction(c, 2),
            "top_2gram_frac": top_ngram_fraction(c, 2),
        }
    )


# ------------------------------------------- corpus-level boilerplate
# C4-style boilerplate removal (Raffel et al. 2020 §2.2): a line that
# recurs across many documents (cookie banners, nav menus, license
# headers) is template noise, not content.  This is the corpus-level
# complement of the per-doc signals above: one explode + one count agg +
# one anti-join — all shuffle-parallel, no driver state, so the
# boilerplate set can be billions of lines without changing the plan.


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Lines appearing in >= ``min_docs`` distinct documents.
    Returns (line, n_docs)."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\n")).alias("line")
    )
    return (
        lines.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Strip corpus-frequent lines from every document, preserving the
    original order of surviving lines.  Documents whose lines are all
    boilerplate come back with empty text (drop with a filter if
    unwanted — keeping them makes the operation row-count-preserving)."""
    bp = boilerplate_lines(df, id_col, text_col, min_docs).select("line")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    kept = lines.join(bp, "line", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )
    # left join keeps all-boilerplate docs (they lose every line)
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .withColumn("clean_text", F.coalesce(F.col("clean_text"), F.lit("")))
    )


# -------------------------------------------------------- PII redaction

# patterns restricted to the syntax subset Java regex and RE2 share, so
# the DuckDB oracle applies the byte-identical transformation
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
)


def clean_text(text: Column) -> Column:
    """Encoding/whitespace normalization (the ftfy-lite pass every crawl
    pipeline runs before filtering): strip C0/C1 control characters
    (except the whitespace ones), collapse whitespace runs to a single
    space, and trim.  Pure ``regexp_replace`` chain — codegen, no UDF.

    Regexes use explicit character classes shared by Java regex (Spark)
    and RE2 (DuckDB oracle): ``\\s`` differs between the two engines
    (Java includes ``\\x0B``, RE2 does not), so it is never used here."""
    out = F.regexp_replace(text, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")
    out = F.regexp_replace(out, "[ \\t\\n\\x0B\\f\\r]+", " ")
    return F.trim(out)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and +intl phone numbers with typed
    placeholders.  Order matters (emails contain dotted digits).  Pure
    ``regexp_replace`` chain — codegen, no UDF."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> Dict[str, Column]:
    """Match counts per category (audit columns for a redaction pass)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }


# ----------------------------------------------- Gopher-style doc filter


def gopher_rules(
    text: Column,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_tok_len: float = 3.0,
    max_mean_tok_len: float = 12.0,
    min_alpha_frac: float = 0.7,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 1,
) -> Dict[str, Column]:
    """The individual boolean rules of a Gopher-style document filter
    (Rae et al. 2021, A1.1): length window, mean word length window,
    alphabetic-word fraction, symbol soup ratio (# and ellipses per
    token), and minimum stopword evidence.  Returned separately so a
    pipeline can audit WHY a doc failed, not just that it did."""
    t = tokens(text)
    n = token_count(text)
    alpha_frac = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / n
    symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), F.lit(0)))
    stop_hits = stopword_hits(text, "en")
    return {
        "r_len": (n >= min_tokens) & (n <= max_tokens),
        "r_mean_len": (mean_token_length(text) >= min_mean_tok_len)
        & (mean_token_length(text) <= max_mean_tok_len),
        "r_alpha": F.round(alpha_frac, 6) >= min_alpha_frac,
        "r_symbol": F.round(symbols / n, 6) <= max_symbol_ratio,
        "r_stop": stop_hits >= min_stop_hits,
    }


def gopher_filter(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Attach the rule booleans plus the conjunction ``keep``."""
    rules = gopher_rules(F.col(text_col), **thresholds)
    out = df.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


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


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the RAG /
    long-context ingestion primitive.  One narrow generator (explode of
    a computed index range) per doc: no shuffle, chunk count bounded by
    document length.  Output: ``(id, chunk_idx, start_tok, n_tok,
    chunk_text)`` with ``start_tok`` 0-based; the final chunk may be
    short.  SQL twin: ``generate_series`` + ``list_slice``."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    num_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1))
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), num_chunks.cast("int") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * step
    piece = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return base.select(
        "id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        F.size(piece).cast("bigint").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def cross_doc_repeated_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-span signal (the scalable cousin of
    exact-substring dedup, Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better"): for each document, the fraction of
    its token n-gram positions whose n-gram also appears in at least
    ``min_docs - 1`` OTHER documents.  High values mark boilerplate /
    templated / plagiarized content that per-document repetition and
    line-level boilerplate signals both miss.

    Plan shape: explode n-gram hashes with their positions (narrow),
    count documents per distinct gram (one shuffle on the 60-bit gram
    hash — never gram strings), join the repeated-gram set back
    (planner/AQE picks broadcast when it fits), one per-doc aggregation.
    No pair enumeration anywhere — cost is corpus-gram-count, not
    pairs."""
    from .dedup import portable_hash64

    toks = tokens(F.lower(F.col(text_col)))
    cnt = F.greatest(F.size(toks) - n + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: portable_hash64(F.array_join(F.slice(toks, i, n), " "), seed=13),
    )
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(grams).alias("pos", "gh"),
    )
    docs_per_gram = (
        pos.select("id", "gh").distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
    )
    flagged = pos.join(docs_per_gram.select("gh"), "gh")
    per_doc = (
        pos.groupBy("id").agg(F.count(F.lit(1)).alias("total_pos"))
        .join(
            flagged.groupBy("id").agg(F.count(F.lit(1)).alias("rep_pos")),
            "id",
            "left",
        )
        .select(
            "id",
            "total_pos",
            F.coalesce(F.col("rep_pos"), F.lit(0)).alias("rep_pos"),
        )
    )
    return per_doc.withColumn(
        "repeated_frac", F.round(F.col("rep_pos") / F.col("total_pos"), 6)
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring dedup as REMOVAL (Lee et al. 2022): cut every
    token span whose ``n``-gram occurs in >= ``min_docs`` documents, and
    rebuild the remaining text.  Where :func:`cross_doc_repeated_fraction`
    only *scores* the contamination, this removes it.

    Plan shape (no pair enumeration, no suffix array): gram-hash
    positions exploded narrow; one shuffle counts docs per distinct
    60-bit gram hash; repeated gram starts expand to covered token
    positions (``sequence`` explode, factor n, bounded); an anti-join
    drops covered tokens; per-doc ``array_sort(collect_list)`` rebuilds
    the text in token order.  Every stage is corpus-linear — the
    classical suffix-array formulation is superseded by the gram-hash
    count because spans shorter than ``n`` are below the match threshold
    by definition.

    Output: ``(id_col, clean_text, n_toks, n_removed)``.  The rebuilt
    text is whitespace-normalized (single spaces), tokens outside
    removed spans preserved in order; a fully-repeated doc comes back
    with empty text rather than disappearing (the caller decides whether
    to drop empties).  Removal is symmetric (ALL copies lose the span,
    C4-boilerplate-style); keep-one-copy semantics belong to document-
    level dedup which runs before this."""
    from .dedup import portable_hash64

    toks = tokens(F.lower(F.col(text_col)))
    cnt = F.greatest(F.size(toks) - n + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: portable_hash64(F.array_join(F.slice(toks, i, n), " "), seed=13),
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("tk"), grams.alias("gharr"))
    tok_pos = base.select(
        "id", F.posexplode("tk").alias("tp", "tok")
    ).select("id", (F.col("tp") + 1).alias("ti"), "tok")
    gpos = base.select(
        "id", F.posexplode("gharr").alias("gp", "gh")
    ).select("id", (F.col("gp") + 1).alias("start"), "gh")
    repeated = (
        gpos.select("id", "gh").distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
    )
    covered = (
        gpos.join(repeated.select("gh"), "gh")
        .select(
            "id",
            F.explode(F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))).alias("ti"),
        )
        .distinct()
    )
    kept = tok_pos.join(covered, ["id", "ti"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ti", "tok"))), lambda x: x["tok"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = base.select("id", F.size("tk").cast("bigint").alias("n_toks"))
    return totals.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_toks",
        (F.col("n_toks") - F.coalesce("n_kept", F.lit(0))).cast("bigint").alias("n_removed"),
    )


def dedup_lines_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 30,
) -> DataFrame:
    """Corpus-wide line-level exact dedup (the RefinedWeb/C4 "remove
    duplicated lines across documents" pass): every line of ``min_chars``
    or more survives only in its FIRST occurrence — the document with
    the smallest ``id_col`` (position breaking ties) — and is cut
    everywhere else.  Short lines are exempt (headings, list markers:
    high collision rate, low token mass).

    Differs from :func:`remove_boilerplate`, which cuts frequent lines
    from *all* docs past a threshold: here one canonical copy is kept,
    so unique content is never lost.

    Shape: posexplode → one shuffle keyed by the line (min_by winner) →
    rebuild.  The winner aggregation is map-side combinable; no
    all-pairs anything, line-count-linear at any corpus size.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    eligible = F.length(F.trim(F.col("line"))) >= min_chars
    winners = (
        lines.filter(eligible)
        .groupBy("line")
        .agg(F.min(F.struct("_id", "pos")).alias("_w"))
        .select("line", F.col("_w._id").alias("_wid"), F.col("_w.pos").alias("_wpos"))
    )
    kept = (
        lines.join(winners, "line", "left")
        .filter(
            F.col("_wid").isNull()  # short/exempt line: always keep
            | ((F.col("_id") == F.col("_wid")) & (F.col("pos") == F.col("_wpos")))
        )
    )
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def template_fingerprint(text: Column) -> Column:
    """Template-masked content hash: lowercase, digit runs -> ``0``,
    punctuation stripped, whitespace collapsed, then sha256.  Documents
    generated from the same template (product pages, log lines, form
    letters) collide even when their numbers/ids differ — the standard
    boilerplate-dup signal exact hashing misses.  Pure codegen Column
    work (shared RE2/Java regex subset).  SQL:
    ``sha256(trim(regexp_replace(regexp_replace(regexp_replace(
    lower(text), '[0-9]+', '0', 'g'), '[^a-z0-9 ]', ' ', 'g'),
    '\\s+', ' ', 'g')))``."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[0-9]+", "0")
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.sha2(t, 256)


def template_groups(
    df: DataFrame, id_col: str, text_col: str = "text", min_size: int = 2
) -> DataFrame:
    """Template-duplicate groups: ``(template_hash, n_docs, min_id)``
    for every masked-content group with >= ``min_size`` members.  One
    hash-groupBy — the same scale shape as exact dedup; dropping all
    but ``min_id`` per group is one anti-join away."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(template_fingerprint(F.col(text_col)).alias("template_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col(id_col)).alias("min_id"),
        )
        .filter(F.col("n_docs") >= min_size)
    )


def char_entropy(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    low-entropy spam signal ("aaaa…", repeated separators, binary junk
    pasted as text score near 0; natural language sits around 4 bits).

    Returns ``(id_col, n_chars, entropy_nano)`` with entropy in NATS
    quantized to integer nano-units: each character class contributes
    ``(c/n) * ln(n/c)`` rounded to nanos BEFORE the sum, so the
    aggregate is exact BIGINT arithmetic in any order — bit-identical
    to the SQL oracle.

    Scale shape: one char-explode pass reduced immediately to
    per-(doc, char) counts (the same collapse as term frequencies);
    cost ∝ corpus characters, one shuffle on (doc, char).

    r10: chars come from ONE ``split(text, '')`` per document (O(len),
    verified codepoint-clean incl. unicode, no trailing empties) instead
    of the old position-explode + ``substring(_t, _i, 1)`` — UTF8String
    substring is O(position), so the old per-char extraction was
    O(len²) per document.  Same (doc, char) counts, same shuffle;
    measured 7/7 interleaved warm cycles faster at sf0.1, median
    2.72s → 1.36s (ratio 0.46)."""
    chars = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) >= 1))
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("_c"))
        .groupBy(id_col, "_c")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    totals = chars.groupBy(id_col).agg(F.sum("_cnt").alias("n_chars"))
    term = F.round(
        F.col("_cnt").cast("double")
        / F.col("n_chars").cast("double")
        * F.log(F.col("n_chars").cast("double") / F.col("_cnt").cast("double"))
        * F.lit(1000000000.0)
    ).cast("bigint")
    return (
        chars.join(totals, id_col)
        .groupBy(id_col, "n_chars")
        .agg(F.sum(term).alias("entropy_nano"))
        .select(id_col, "n_chars", "entropy_nano")
    )


def ngram_diversity(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 3,
    decimals: int = 9,
    exact: bool = True,
) -> DataFrame:
    """Per-group n-gram diversity (distinct-n): ``(group, total_ngrams,
    distinct_ngrams, diversity)`` with ``diversity = distinct / total``
    — the corpus-level repetitiveness signal (low distinct-3 marks
    template farms and boilerplate-heavy sources; the per-document
    cousins are :func:`dup_ngram_fraction` / repetition_signals).

    Plan (exact): explode word n-grams WITH multiplicity, one groupBy
    (group, gram) -> one groupBy (group).  Shuffle volume is the gram
    table once; both aggregations combine map-side.  Exact BIGINT
    counts; the ratio is one division of two exact integers.  The gram
    shuffle is linear in corpus size (measured exp 0.89) — at the
    100 TB tier pass ``exact=False``: distinct counting drops to an
    ``approx_count_distinct`` HLL sketch, ONE aggregation whose partials
    are sketch-sized, no per-gram table at all."""
    grams = scale_out_narrow_scan(df).select(
        F.col(group_col).alias("grp"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    if not exact:
        return grams.groupBy("grp").agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.approx_count_distinct("gram", rsd=0.01).alias("distinct_ngrams"),
        ).select(
            F.col("grp").alias(group_col),
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                decimals,
            ).alias("diversity"),
        ).orderBy(group_col)
    per_gram = grams.groupBy("grp", "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("grp")
        .agg(
            F.sum("c").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                decimals,
            ).alias("diversity"),
        )
        .orderBy(group_col)
    )


def blocklist_hits(
    text: Column, words: "list[str]", decimals: int = 9
) -> "tuple[Column, Column]":
    """Blocklist screening (the C4 'bad words' filter stage): returns
    ``(hit_count, hit_ratio)`` columns — total blocklisted-token
    occurrences and their share of the token count.  Pure Column
    expressions (codegen, zero shuffle): the word list compiles to one
    case-insensitive alternation wrapped in word boundaries; ``\\b`` and
    the alternation subset behave identically in Java regex (Spark) and
    RE2 (the DuckDB oracle), same portability rule as PII_PATTERNS."""
    import re as _re

    alt = "|".join(_re.escape(w.lower()) for w in words)
    pat = rf"\b({alt})\b"
    hits = F.coalesce(
        F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 1)), F.lit(0)
    ).cast("bigint")
    ratio = F.when(
        token_count(text) > 0,
        F.round(hits.cast("double") / token_count(text).cast("double"), decimals),
    ).otherwise(F.lit(0.0))
    return hits, ratio


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    decimals: int = 9,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization/near-copy signal
    used to rank documents for curation: the share of a document's
    DISTINCT word n-grams that appear in no other document.  Low
    novelty marks mirrored/boilerplate content :func:`dup_ngram_fraction`
    cannot see (it is within-doc); high novelty marks unique text worth
    keeping.

    Plan — NO gram-keyed join back (r8): a gram with document-frequency
    1 has exactly ONE owning document, so ``min(id)`` inside the same
    aggregation that computes the frequency carries the owner for free.
    Per-doc novel counts then come from a doc-keyed aggregation of the
    singleton grams, and totals from a doc-keyed aggregation of the
    distinct-gram frame — the final join is DOC-count-sized (tiny),
    where the old plan reshuffled the whole gram table onto the gram
    key a second time.  Exact BIGINT counts, one final division.
    """
    grams = (
        scale_out_narrow_scan(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("_g"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = grams.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_df"),
        F.min(id_col).alias("_owner"),
    )
    novel = (
        dfreq.filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(novel, id_col, "left")
        .withColumn(
            "novel_grams", F.coalesce(F.col("novel_grams"), F.lit(0))
        )
        .select(
            id_col,
            "n_grams",
            F.col("novel_grams").cast("bigint").alias("novel_grams"),
            F.round(
                F.col("novel_grams").cast("double")
                / F.col("n_grams").cast("double"),
                decimals,
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )


def zipf_slope(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_n: int = 500,
    decimals: int = 9,
) -> DataFrame:
    """Per-group Zipf rank-frequency slope: least-squares fit of
    ``ln(freq) ~ ln(rank)`` over each group's ``top_n`` most frequent
    words.  Natural text sits near −1; a shallow slope marks templated
    or synthetic sources, a steep one a collapsed vocabulary — a
    corpus-health scalar you can threshold per source.

    Returns ``(group, n_ranks, slope)``.

    Plan: one word-count aggregation per (group, word), a per-group
    ``row_number`` window ranks by frequency (ties by word — total,
    engine-portable order), ranks beyond ``top_n`` prune BEFORE the fit,
    and the regression reduces to five exact BIGINT sums of integer
    nano-logs — order-independent, so the slope is partition-exact and
    the SQL oracle reproduces it bit-for-bit.  Shuffle volume: the word
    table once, then top_n rows per group."""
    from pyspark.sql import Window

    # micro-logs, not nano: the regression sums x*y products, and
    # (ln(rank)*1e9)^2 ~ 4e19 overflows BIGINT; at 1e6 the products are
    # ~4e13 and whole-group sums stay exact BIGINT math
    MICRO = 1_000_000
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("grp", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("freq").desc(), F.col("word").asc()
    )
    ranked = (
        words.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "grp",
            F.round(F.log(F.col("rank").cast("double")) * F.lit(float(MICRO)))
            .cast("bigint").alias("x"),
            F.round(F.log(F.col("freq").cast("double")) * F.lit(float(MICRO)))
            .cast("bigint").alias("y"),
        )
    )
    agg = ranked.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_ranks").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    # ANSI mode (Spark 4 default) raises on division by zero: a group
    # with a single rank has den == 0 — emit NULL slope instead (the
    # oracle mirrors with CASE WHEN)
    return agg.select(
        group_col,
        "n_ranks",
        F.when(den != F.lit(0.0), F.round(num / den, decimals)).alias("slope"),
    ).orderBy(group_col)
