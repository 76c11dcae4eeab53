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


def test_bm25_query_terms_case_insensitive(spark):
    """The index stores lowercase tokens; mixed-case query terms must be
    normalized the same way or they silently match zero postings."""
    df = spark.createDataFrame(
        [(1, "Spark Join scan"), (2, "join filter"), (3, "pad pad")],
        ["doc_id", "text"],
    )
    lower = bm25_search(df, ["spark", "join"], topk=10).collect()
    upper = bm25_search(df, ["SPARK", "Join"], topk=10).collect()
    assert [tuple(r) for r in upper] == [tuple(r) for r in lower]
    assert len(lower) == 2


def test_bm25_empty_terms_returns_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    out = bm25_search(df, [], topk=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_terms", "score"]


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


def test_hdr_quantiles_within_relative_error(spark):
    from dlt_spark.dataops.sketches import (
        hdr_merge,
        hdr_quantiles,
        hdr_rel_error,
        hdr_sketch,
    )

    # deterministic skewed positives: 1..10000 squared / 100
    vals = [(i, (i * i) / 100.0) for i in range(1, 10001)]
    df = spark.createDataFrame(vals, ["i", "x"])
    sk = hdr_sketch(df, "x", k=7, scale=100)
    got = {
        r["q"]: r["estimate"]
        for r in hdr_quantiles(sk, [0.25, 0.5, 0.9, 0.99], scale=100).collect()
    }
    import math

    tol = hdr_rel_error(7)
    for q, est in got.items():
        exact = sorted(v for _, v in vals)[max(math.ceil(q * 10000), 1) - 1]
        # bucket lower bound: estimate <= exact, within 2^-k relative
        assert est <= exact + 1e-9
        assert (exact - est) / exact <= tol + 1e-9

    # merge of two half-sketches == sketch of the whole
    a = hdr_sketch(df.filter("i % 2 = 0"), "x", k=7, scale=100)
    b = hdr_sketch(df.filter("i % 2 = 1"), "x", k=7, scale=100)
    got2 = {
        r["q"]: r["estimate"]
        for r in hdr_quantiles(
            hdr_merge(a, b), [0.25, 0.5, 0.9, 0.99], scale=100
        ).collect()
    }
    assert got == got2


def test_hdr_small_values_exact_and_nonpositive_bucket(spark):
    from dlt_spark.dataops.sketches import hdr_quantiles, hdr_sketch

    # values below 2^(k+1)=256 (after scale=1) are bucketed exactly
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 100, 255, 0, -5]], ["x"])
    sk = hdr_sketch(df, "x", k=7, scale=1)
    buckets = sorted(r["bucket"] for r in sk.collect())
    assert buckets == [0, 1, 2, 3, 100, 255]  # 0 and -5 share bucket 0
    got = {r["q"]: r["estimate"] for r in hdr_quantiles(sk, [1.0], scale=1).collect()}
    assert got[1.0] == 255.0


def test_hdr_grouped_matches_global_per_group(spark):
    from dlt_spark.dataops.sketches import (
        hdr_quantiles,
        hdr_quantiles_grouped,
        hdr_sketch,
        hdr_sketch_grouped,
    )

    data = [(("a" if i % 3 == 0 else "b"), float(i)) for i in range(1, 3001)]
    df = spark.createDataFrame(data, ["g", "x"])
    sk = hdr_sketch_grouped(df, "x", "g", k=7, scale=10)
    got = {
        (r["g"], r["q"]): r["estimate"]
        for r in hdr_quantiles_grouped(sk, "g", [0.5, 0.95], scale=10).collect()
    }
    for g in ("a", "b"):
        sub = df.filter(f"g = '{g}'")
        ref = {
            r["q"]: r["estimate"]
            for r in hdr_quantiles(
                hdr_sketch(sub, "x", k=7, scale=10), [0.5, 0.95], scale=10
            ).collect()
        }
        for q in (0.5, 0.95):
            assert got[(g, q)] == ref[q]


def test_bloom_no_false_negatives_and_merge(spark):
    from dlt_spark.dataops.sketches import (
        bloom_fp_rate,
        bloom_merge,
        bloom_might_contain,
        bloom_sketch,
    )

    members = spark.createDataFrame([(f"key{i}",) for i in range(2000)], ["v"])
    bloom = bloom_sketch(members, "v", num_bits=1 << 16, num_hashes=5)

    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 4000)], ["v"]
    )
    got = {
        r["v"]: r["_bloom_maybe"]
        for r in bloom_might_contain(probe, "v", bloom, 1 << 16, 5).collect()
    }
    # every member must hit (no false negatives — the safety property)
    assert all(got[f"key{i}"] for i in range(2000))
    # false positives among non-members stay near the analytic rate
    fp = sum(1 for i in range(2000, 4000) if got[f"key{i}"])
    assert fp / 2000 < 5 * max(bloom_fp_rate(2000, 1 << 16, 5), 1e-3)

    # merge of two half-filters == filter of the union
    a = bloom_sketch(members.filter("v < 'key1'"), "v", 1 << 16, 5)
    b = bloom_sketch(members.filter("v >= 'key1'"), "v", 1 << 16, 5)
    merged = {(r["w"], r["bits"]) for r in bloom_merge(a, b).collect()}
    whole = {(r["w"], r["bits"]) for r in bloom.collect()}
    assert merged == whole


def test_dedup_against_bloom_prefilter_identical_result(spark):
    from dlt_spark.dataops.dedup import dedup_against

    rows = [(i, f"unique document text number {i} with padding words") for i in range(40)]
    # make 41/42 exact copies of ref docs 1/2
    rows += [(41, rows[1][1]), (42, rows[2][1]), (43, "fresh text nothing like the rest at all")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = df.filter("doc_id < 40")
    new = df.filter("doc_id >= 40")
    base = {r["doc_id"] for r in dedup_against(new, ref, "doc_id").collect()}
    bloomed = {
        r["doc_id"]
        for r in dedup_against(new, ref, "doc_id", bloom_bits=1 << 14).collect()
    }
    assert base == bloomed
    assert 41 not in base and 42 not in base and 43 in base


def test_hybrid_search_rrf(spark):
    from dlt_spark.dataops.search import hybrid_search

    docs = spark.createDataFrame(
        [
            (1, "spark join vector engine"),
            (2, "spark spark spark only lexical hit"),
            (3, "nothing relevant here at all"),
            (4, "join vector"),
        ],
        ["doc_id", "text"],
    )
    # embeddings: doc 3 is the exact query vector (pure semantic hit),
    # doc 1 close, docs 2/4 orthogonal-ish
    emb = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.0]),
            (4, [0.1, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = hybrid_search(
        docs, emb, ["spark", "join", "vector"], [1.0, 0.0],
        candidates=4, topk=4,
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 1 ranks in BOTH lists -> two RRF contributions -> first overall
    assert out[0]["doc_id"] == 1
    # doc 3 never matches a term: lexical rank NULL, semantic rank 1
    assert rows[3]["r_lex"] is None and rows[3]["r_sem"] == 1
    # doc 2: lexical hit only — present with null semantic contribution
    # is fine as long as its fused score is below doc 1's
    assert rows[2]["rrf_score"] < rows[1]["rrf_score"]
    # scores are RRF sums: doc1 = 1/(60+r_lex) + 1/(60+r_sem)
    r = rows[1]
    assert abs(r["rrf_score"] - (1 / (60 + r["r_lex"]) + 1 / (60 + r["r_sem"]))) < 1e-9
