"""Keyword search over a document corpus: inverted index + BM25 ranking.

Search-engine-grade relevance as a pure DataFrame program:

- ``inverted_index`` materializes the classic ``(token, doc_id, tf)``
  postings table plus per-doc lengths — both derivable in ONE tokenize
  pass, both partitionable/persistable as tables (write the postings
  ``partitionBy('token')`` bucket and term lookups become partition
  pruning).
- ``bm25_search`` scores only the postings of the query terms: the
  token filter prunes the postings scan (predicate pushdown on the
  partition column when the index is stored), per-term document
  frequencies and the global average doc length are broadcast scalars,
  and the final per-doc sum + top-k is one small aggregation.  Nothing
  touches documents that share no term with the query — at 100 TB the
  cost is proportional to the query terms' posting lists, not the
  corpus.

Determinism: BM25 mixes ln/division floats, so each per-(doc, term)
contribution is quantized to integer *nano*-units and summed as BIGINT
(associative, engine-portable — same recipe as
:mod:`dlt_spark.dataops.lm`), with the final HALF_UP rounding done in
pure integer math.  The DuckDB oracle reproduces scores bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple:
    """Return ``(postings, doc_lens)``: the ``(token, id, tf)`` postings
    table and the ``(id, dl)`` doc-length table."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(F.col(id_col), F.explode(toks).alias("token"))
    # NO checkpoint on postings (r11): bm25's query-term `isin` filter
    # is on the GROUP KEY, so Catalyst pushes it below this aggregation
    # — each postings consumer re-runs a scan + explode + term-filter
    # with a query-terms-sized shuffle, which is strictly cheaper than
    # materializing the full corpus-scale index into executor storage
    # (the r10 checkpoint) just to filter it down to a handful of terms.
    # Callers that genuinely reuse the whole index persist it as a
    # TABLE (index_ingest) — that is the reuse path, not localCheckpoint.
    postings = exploded.groupBy("token", id_col).agg(F.count("*").alias("tf"))
    # doc lengths straight off the text (r11): `split` with the default
    # limit keeps trailing empties, so its piece count is EXACTLY
    # separator-matches + 1 — `regexp_count(trim(text), '\s+') + 1`
    # equals the exploded token count per doc (lower() cannot change
    # whitespace; null texts drop on both paths) without the split's
    # array materialization.  The doc-length table therefore needs NO
    # shuffle at all — the r10 form re-aggregated the whole postings
    # table by id (a postings-sized exchange at corpus scale, and the
    # driver's cold numbers priced the checkpoint chain at ~+0.25s,
    # bm25 0.86 -> 1.10s).  Cast to bigint so the (id, dl) schema stays
    # identical to the old sum(tf).  No checkpoint: its two consumers
    # are one scan-aggregate (n_docs) and one broadcast-probe join —
    # each a light regex pass; the checkpoint machinery measured more
    # expensive cold than the one pass it saved.
    doc_lens = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        (F.regexp_count(F.trim(F.col(text_col)), F.lit(r"\s+")) + 1)
        .cast("bigint")
        .alias("dl"),
    )
    return postings, doc_lens


def bm25_from_index(
    postings: DataFrame,
    doc_lens: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25 scoring from a PREBUILT ``(postings, doc_lens)`` index (see
    :func:`inverted_index`): the query path never re-tokenizes the
    corpus — the form an incrementally-maintained index serves
    (:func:`dlt_spark.streaming.index_ingest` appends per-batch
    generations; new batches have disjoint doc ids, so the union of
    generations IS the full index with no re-aggregation).

    Query terms are lowercased to match :func:`inverted_index`'s token
    normalization (the index stores lowercase tokens only)."""
    terms = [t.lower() for t in terms]
    if not terms:
        return (
            doc_lens.select(
                F.col(id_col),
                F.lit(0).cast("bigint").alias("n_terms"),
                F.lit(0.0).alias("score"),
            ).limit(0)
        )
    n_docs = doc_lens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # hits feeds both the per-term document frequencies and the scored
    # join; the term filter pushes below the postings aggregation (it is
    # on the group key), so each consumer re-runs a filtered scan with a
    # query-terms-sized shuffle — cheaper than any materialization (r11)
    hits = postings.filter(F.col("token").isin(list(terms)))
    dfreq = hits.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        hits.join(dfreq, "token")
        .join(doc_lens, id_col)
        .join(F.broadcast(n_docs))
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    idf = F.log((nd - dfd + 0.5) / (dfd + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    contrib = idf * (tfd * (k1 + 1.0)) / (tfd + k1 * (1.0 - b + b * dld / avgdl))
    nano = F.round(contrib * F.lit(1000000000.0)).cast("bigint")
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_terms"), F.sum(nano).alias("score9")
    )
    # integer HALF_UP to 6 decimals: micro = (2*score9 + 1000) div 2000
    return (
        agg.select(
            id_col,
            "n_terms",
            (
                F.expr("(2 * score9 + 1000) div 2000").cast("double") / F.lit(1000000.0)
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(topk)
    )


def bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-``topk`` documents for a bag-of-words query under BM25.

    Returns ``(id_col, n_terms, score)`` ordered by score desc (ties by
    id).  ``n_terms`` is how many distinct query terms the doc matched.
    """
    postings, doc_lens = inverted_index(df, id_col, text_col)
    return bm25_from_index(postings, doc_lens, terms, id_col, k1, b, topk)


def hybrid_search(
    df: DataFrame,
    emb_df: DataFrame,
    terms: Sequence[str],
    query_vec: Sequence[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
    candidates: int = 100,
    topk: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid lexical + semantic retrieval via Reciprocal Rank Fusion.

    Two independent candidate generators — BM25 over the inverted index
    (cost ∝ the query terms' postings) and cosine top-k over the
    embedding column (TakeOrdered scan, or swap in the IVF/LSH probe at
    corpus scale) — each produce ``candidates`` ranked ids; fusion is
    the standard RRF ``sum(1 / (rrf_k + rank))`` over the lists a doc
    appears in (Cormack et al., SIGIR 2009).  Rank fusion avoids score
    normalization entirely, so the result is deterministic and
    engine-exact — no comparing BM25 logs against cosines.

    The ranking windows run on candidate lists (≤ ``candidates`` rows),
    never on the corpus: the single-partition window is bounded by
    construction.  Returns ``(id, r_lex, r_sem, rrf_score)``.
    """
    from pyspark.sql import Window

    from .similarity import cosine_topk

    lex = bm25_search(df, terms, id_col, text_col, k1, b, topk=candidates)
    w_lex = Window.orderBy(F.desc("score"), F.col(id_col))
    lexr = lex.select(
        F.col(id_col).alias("_id"),
        F.row_number().over(w_lex).cast("bigint").alias("r_lex"),
    )
    sem = cosine_topk(emb_df, query_vec, emb_id_col, vec_col, k=candidates)
    w_sem = Window.orderBy(F.desc("cosine"), F.col(emb_id_col))
    semr = sem.select(
        F.col(emb_id_col).alias("_id"),
        F.row_number().over(w_sem).cast("bigint").alias("r_sem"),
    )
    fused = lexr.join(semr, "_id", "full_outer")
    contrib = lambda r: F.when(
        F.col(r).isNotNull(), F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(r))
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            F.col("_id").alias(id_col),
            "r_lex",
            "r_sem",
            F.round(contrib("r_lex") + contrib("r_sem"), 9).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(topk)
    )
