"""Unit tests for the inverted-index / BM25 search operators and the
grouped HLL sketch."""

import math

import pytest

from dlt_spark.dataops.search import bm25_search, inverted_index
from dlt_spark.dataops.sketches import (
    hll_estimate_grouped,
    hll_sketch_grouped,
    hll_std_error,
)


def test_inverted_index_shapes(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    postings, dlens = inverted_index(df)
    p = {(r["token"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert p == {("a", 1): 2, ("b", 1): 1, ("b", 2): 1, ("c", 2): 1}
    d = {r["doc_id"]: r["dl"] for r in dlens.collect()}
    assert d == {1: 3, 2: 2}


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    """Plain-Python BM25 with the same nano-quantization."""
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s9 = 0
        m = 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            c = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
            s9 += round(c * 1e9)
        if m:
            out[i] = (m, ((2 * s9 + 1000) // 2000) / 1e6)
    return out


def test_bm25_matches_reference_math(spark):
    corpus = {
        1: "spark join scan spark",
        2: "join filter table",
        3: "vector scan scan",
        4: "filter table row",
    }
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_search(df, ["spark", "join", "vector"], topk=10).collect()
    }
    assert got == _bm25_ref(corpus, ["spark", "join", "vector"])


def test_bm25_ranks_term_frequency(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark pad pad"), (2, "spark pad pad pad pad"), (3, "pad pad")],
        ["doc_id", "text"],
    )
    rows = bm25_search(df, ["spark"], topk=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["score"] > rows[1]["score"]


def test_hll_grouped_close_to_exact_and_merges(spark):
    data = [(("even" if i % 2 == 0 else "odd"), i % 500) for i in range(5000)]
    df = spark.createDataFrame(data, ["grp", "uid"])
    sk = hll_sketch_grouped(df, "uid", "grp", p=8)
    est = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_grouped(sk, "grp", p=8).collect()
    }
    # exact: evens 0..498 -> 250 distinct, odds -> 250 distinct
    err = 3 * hll_std_error(8)
    for g in ("even", "odd"):
        assert abs(est[g] - 250) / 250 < err

    # merging two half-sketches == sketching the whole, per group
    df1, df2 = df.filter("uid < 250"), df.filter("uid >= 250")
    from pyspark.sql import functions as F

    merged = (
        hll_sketch_grouped(df1, "uid", "grp", p=8)
        .unionByName(hll_sketch_grouped(df2, "uid", "grp", p=8))
        .groupBy("grp", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est2 = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_grouped(merged, "grp", p=8).collect()
    }
    assert est == est2
