"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

Standard LLM-training hygiene (GPT-3 §C / PaLM / Llama reports): a
training document is *contaminated* if it shares word n-grams with any
benchmark document; contaminated docs are dropped or flagged before
training.  The reference engine (dlt) has no such operator — this is a
beyond-reference dataop (SURVEY §2.L).

Scale design (100 TB corpus, ~10^4-10^6 benchmark docs):

- The benchmark n-gram set is *small* relative to the corpus (benchmarks
  are fixed eval suites).  We aggregate it to a distinct-gram table and
  let the join side be broadcast by the planner/AQE — the corpus side is
  never shuffled for the join, only for the final per-doc aggregation
  (one shuffle on doc id).
- Corpus n-grams are exploded lazily (``explode`` of a distinct
  ``transform`` array) — bounded by document length, never materialized
  per-pair.
- Per-doc distinct-gram counts ride the same aggregation, so the whole
  operator is: scan → explode → [broadcast] hash join → one groupBy.

Everything is built-in Column expressions (codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngram_set(text: Column, n: int) -> Column:
    """Distinct word ``n``-grams of lower-cased whitespace-tokenized
    text, as an array column.  SQL twin (DuckDB):
    ``list_distinct(list_transform(generate_series(1, len(toks)-n+1),
    i -> array_to_string(list_slice(toks, i, i+n-1), ' ')))``."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    count = F.size(toks) - n + 1
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(count > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram table of the benchmark set — the (small) build
    side of the contamination join."""
    return (
        benchmark.select(F.explode(word_ngram_set(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination metrics against a benchmark set.

    Returns one row per corpus document that shares at least one word
    ``n``-gram with the benchmark: ``(id, overlap_ngrams, doc_ngrams,
    overlap_frac)`` where ``overlap_frac = overlap_ngrams/doc_ngrams``.
    Callers drop/flag above a threshold (0.0 = any shared gram).
    """
    bench = benchmark_ngrams(benchmark, text_col, n)
    doc_grams = corpus.select(
        F.col(id_col).alias("id"),
        word_ngram_set(F.col(text_col), n).alias("gs"),
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
) -> DataFrame:
    """Drop corpus documents whose benchmark n-gram overlap fraction
    exceeds ``max_overlap_frac`` (default: any overlap).  Anti-join on
    the flagged id set — corpus rows stream through unshuffled."""
    flagged = ngram_overlap(corpus, benchmark, id_col, text_col, n).filter(
        F.col("overlap_frac") > max_overlap_frac
    )
    return corpus.join(
        flagged.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
