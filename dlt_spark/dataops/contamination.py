"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

Standard LLM-training hygiene (GPT-3 §C / PaLM / Llama reports): a
training document is *contaminated* if it shares word n-grams with any
benchmark document; contaminated docs are dropped or flagged before
training.  The reference engine (dlt) has no such operator — this is a
beyond-reference dataop (SURVEY §2.L).

Scale design (100 TB corpus, ~10^4-10^6 benchmark docs):

- The benchmark n-gram set is *small* relative to the corpus (benchmarks
  are fixed eval suites).  It is aggregated to a distinct-gram table and
  pinned as the broadcast build side — the corpus side streams map-side
  through the join and is only shuffled once, for the final per-doc
  aggregation.
- Corpus n-grams are exploded lazily — bounded by document length,
  never materialized per-pair.
- Shingling defaults to the Arrow-batched kernel shared with MinHash
  (:func:`dlt_spark.dataops.dedup._shingles_arrow`): Spark's
  higher-order functions are CodegenFallback/interpreted, and the
  measured gap on corpus-scale explosion is ~4-8x.  ``use_arrow=False``
  keeps the engine-portable pure-Column path (bit-identical grams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngram_set(text: Column, n: int) -> Column:
    """Distinct word ``n``-grams of lower-cased whitespace-tokenized
    text, as an array column.  Documents shorter than ``n`` tokens yield
    one truncated gram (the whole document) — the same semantics as
    :func:`dlt_spark.dataops.dedup.shingles`, so the Arrow kernel and
    the DuckDB oracle fragments are shared across dedup and
    decontamination.  SQL twin:
    ``list_distinct(list_transform(generate_series(1,
    greatest(len(toks)-n+1, 1)), i -> array_to_string(list_slice(toks,
    i, i+n-1), ' ')))``."""
    from .dedup import shingles

    return shingles(text, n)


def _gram_expr(text_col: str, n: int, use_arrow: bool) -> Column:
    if use_arrow:
        from .dedup import _shingles_arrow

        return _shingles_arrow(n)(F.col(text_col))
    return word_ngram_set(F.col(text_col), n)


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8, use_arrow: bool = True
) -> DataFrame:
    """Distinct n-gram table of the benchmark set — the (small) build
    side of the contamination join."""
    return (
        benchmark.filter(F.col(text_col).isNotNull())
        .select(F.explode(_gram_expr(text_col, n, use_arrow)).alias("gram"))
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    use_arrow: bool = True,
) -> DataFrame:
    """Per-document contamination metrics against a benchmark set.

    Returns one row per corpus document that shares at least one word
    ``n``-gram with the benchmark: ``(id, overlap_ngrams, doc_ngrams,
    overlap_frac)`` where ``overlap_frac = overlap_ngrams/doc_ngrams``.
    Callers drop/flag above a threshold (0.0 = any shared gram).
    """
    bench = benchmark_ngrams(benchmark, text_col, n, use_arrow)
    doc_grams = corpus.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        _gram_expr(text_col, n, use_arrow).alias("gs"),
    ).select(
        "id",
        F.size("gs").alias("doc_ngrams"),
        F.explode("gs").alias("gram"),
    )
    # The benchmark gram set is the small side by construction (fixed
    # eval suites vs a 100 TB corpus) — pin it as the broadcast build
    # side so the exploded corpus grams stream map-side, never shuffled
    # or (worse) broadcast themselves off a bad pre-explode estimate.
    hits = doc_grams.join(F.broadcast(bench), "gram")
    return (
        hits.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("overlap_ngrams"),
            F.first("doc_ngrams").alias("doc_ngrams"),
        )
        .withColumn(
            "overlap_frac",
            F.round(F.col("overlap_ngrams") / F.col("doc_ngrams"), 6),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_overlap_frac: float = 0.0,
    use_arrow: bool = True,
) -> DataFrame:
    """Drop corpus documents whose benchmark n-gram overlap fraction
    exceeds ``max_overlap_frac`` (default: any overlap).  Anti-join on
    the flagged id set — corpus rows stream through unshuffled."""
    flagged = ngram_overlap(corpus, benchmark, id_col, text_col, n, use_arrow).filter(
        F.col("overlap_frac") > max_overlap_frac
    )
    return corpus.join(
        flagged.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Pairwise n-gram overlap matrix between corpus partitions
    (sources/domains/splits): shared distinct word n-grams and Jaccard
    per source pair.  The corpus-health twin of
    :func:`decontaminate` — instead of checking docs against one
    benchmark, it quantifies cross-partition leakage/duplication for
    EVERY pair (train-vs-eval splits, mirrored crawls, vendor feeds).

    Scale shape: one explode to distinct ``(source, gram)`` rows, then
    ONE groupBy collects each gram's source set (bounded by the source
    count, which is small by construction) and the pair fan-out —
    ``|sources|² `` per gram at worst — explodes in-task under codegen
    (the grouped-array pattern of ``graph._wedge_fanout``; a gram-keyed
    self-join pays two exchanges plus sort-merge for the same rows).
    Candidate volume grows with the distinct-gram count, never with
    ``docs²``.  Counts are integers; the only float is the final
    Jaccard division, rounded to 6.

    Returns ``(source_a, source_b, shared, jaccard)``.
    """
    from .text import scale_out_narrow_scan, word_ngrams

    grams = (
        scale_out_narrow_scan(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(group_col).alias("_grp"),
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("_g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = grams.groupBy("_grp").agg(F.count(F.lit(1)).alias("_sz"))
    per_gram = grams.groupBy("_g").agg(F.collect_list("_grp").alias("_ss"))
    pairs = (
        per_gram.select(F.posexplode("_ss").alias("_i", "_sa"), F.col("_ss"))
        .select("_i", "_sa", F.posexplode("_ss").alias("_j", "_sb"))
        .filter(F.col("_i") < F.col("_j"))
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz = F.broadcast(sizes)
    return (
        pairs.join(sz.select(F.col("_grp").alias("source_a"), F.col("_sz").alias("_sa")), "source_a")
        .join(sz.select(F.col("_grp").alias("source_b"), F.col("_sz").alias("_sb")), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("_sa") + F.col("_sb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


def boundary_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Document-boundary contamination: pairs where one document's
    LAST ``k`` tokens equal another's FIRST ``k`` tokens — the
    split-artifact signature of a source document sliced across two
    records (crawl pagination, chunked ingestion, concatenated shards).
    Sequence packing then re-learns the seam as a real transition, so
    boundary pairs are flagged before packing.

    Returns ``(doc_a, doc_b, boundary_gram)``: ``doc_a``'s tail equals
    ``doc_b``'s head (``doc_a != doc_b``), ordered.

    Scale shape: one pass computes each doc's head-gram and tail-gram
    (pure Column slicing, no explode); the pair search is an equi-join
    of two doc-count-sized single-gram frames on the gram key — the
    inverted-index shape, never all-pairs.  Docs shorter than ``k``
    tokens are excluded (a whole-doc match is duplicate detection's
    job, not boundary detection's)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("_t"),
        )
        .filter(F.size("_t") > k)
    )
    heads = base.select(
        F.col(id_col).alias("doc_b"),
        F.array_join(F.slice("_t", 1, k), " ").alias("boundary_gram"),
    )
    tails = base.select(
        F.col(id_col).alias("doc_a"),
        F.array_join(
            F.slice("_t", F.size("_t") - F.lit(k - 1), F.lit(k)), " "
        ).alias("boundary_gram"),
    )
    return (
        tails.join(heads, "boundary_gram")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "boundary_gram")
        .orderBy("doc_a", "doc_b")
    )
