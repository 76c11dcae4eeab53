"""Unit tests for the unigram-LM scorer and SemDeDup-style semantic dedup."""

import math

import pytest
from pyspark.sql import functions as F

from dlt_spark.dataops.lm import doc_term_freq, unigram_logprob
from dlt_spark.dataops.similarity import semantic_dedup


def test_doc_term_freq_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in doc_term_freq(df, "doc_id", "text").collect()
    }
    assert rows == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 2, (2, "c"): 1}


def test_unigram_logprob_matches_hand_math(spark):
    # corpus: 6 tokens total; p(a)=3/6, p(b)=2/6, p(c)=1/6
    df = spark.createDataFrame([(1, "a b a"), (2, "b c a")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    lp = {t: -math.log(c / 6.0) for t, c in {"a": 3, "b": 2, "c": 1}.items()}
    # integer nano-log HALF_UP reproduction
    n9 = {t: round(v * 1e9) for t, v in lp.items()}

    def expect(toks):
        num = sum(n9[t] for t in toks)
        n = len(toks)
        micro = (2 * num + n * 1000) // (2 * n * 1000)
        return micro / 1e6

    assert out[1]["n_toks"] == 3
    assert out[1]["avg_neg_logp"] == pytest.approx(expect(["a", "b", "a"]), abs=1e-9)
    assert out[2]["avg_neg_logp"] == pytest.approx(expect(["b", "c", "a"]), abs=1e-9)


def test_unigram_logprob_head_tail_split_consistent(spark):
    # same corpus scored with every token in the head vs every token in
    # the tail must give identical results (the split is a pure
    # performance decision)
    df = spark.createDataFrame(
        [(i, "x y z common " * (i + 1)) for i in range(5)], ["doc_id", "text"]
    )
    a = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in unigram_logprob(df, head_min_freq=1).collect()
    }
    b = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in unigram_logprob(df, head_min_freq=10**9).collect()
    }
    assert a == b


def _clustered_vectors():
    # two tight clusters + one loner; 4-dim unit-ish vectors
    return [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0, 0.0], 0),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.01, 0.999, 0.0, 0.0], 1),   # near-dup of 2
        (4, [0.0, 0.0, 1.0, 0.0], 2),
        (5, [0.97, 0.24, 0.0, 0.0], 0),    # looser member of cluster 0
    ]


def test_semantic_dedup_drops_higher_ids(spark):
    from dlt_spark.dataops.similarity import ivf_index

    df = spark.createDataFrame(
        _clustered_vectors(), ["vec_id", "embedding", "label"]
    )
    out = semantic_dedup(
        df, num_centroids=3, threshold=0.99, iters=0, seed=42
    )
    kept = sorted(r["vec_id"] for r in out.collect())

    # recompute the expected survivors in plain Python from the SAME
    # deterministic cell assignment the operator uses: within each cell,
    # a row is dropped iff a lower-id cellmate has cosine >= threshold
    indexed, _ = ivf_index(df, num_centroids=3, iters=0, seed=42)
    rows = indexed.select("vec_id", "embedding", "_ivf_cell").collect()
    vecs = {r["vec_id"]: (r["embedding"], r["_ivf_cell"]) for r in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    expected = sorted(
        i
        for i, (v, c) in vecs.items()
        if not any(
            j < i and cj == c and round(cos(v, vj), 6) >= 0.99
            for j, (vj, cj) in vecs.items()
        )
    )
    assert kept == expected
    # the construction guarantees at least one within-cell dup pair is
    # possible only when the pair shares a cell — but SOMETHING must
    # always survive, and never more than the input
    assert 0 < len(kept) < 6 or kept == list(range(6))


def test_semantic_dedup_keeps_cell_column(spark):
    df = spark.createDataFrame(
        _clustered_vectors(), ["vec_id", "embedding", "label"]
    )
    out = semantic_dedup(df, num_centroids=3, threshold=0.99, iters=0)
    assert "cell" in out.columns
    cells = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert all(isinstance(c, int) for c in cells.values())


def test_vocab_coverage_ranks_and_cumulates(spark):
    from dlt_spark.dataops.lm import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], ["doc_id", "text"]
    )
    rows = vocab_coverage(docs, "doc_id", "text", top_k=3).collect()
    assert [r["token"] for r in rows] == ["a", "b", "c"]  # c before d: tie by token
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert [r["cnt"] for r in rows] == [4, 3, 1]
    # coverage over total 9 tokens: 4/9, 7/9, 8/9
    assert abs(rows[0]["coverage"] - round(4 / 9, 9)) < 1e-12
    assert abs(rows[2]["coverage"] - round(8 / 9, 9)) < 1e-12


def test_pick_canonical_argmax_with_tiebreak(spark):
    from dlt_spark.dataops.dedup import pick_canonical

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["id", "component"]
    )
    qual = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5)], ["id", "quality"]
    )
    got = {
        r["component"]: (r["canonical_id"], r["n_members"], r["quality"])
        for r in pick_canonical(comps, qual).collect()
    }
    # component 1: quality tie 90 between ids 2 and 3 -> smallest id wins
    assert got[1] == (2, 3, 90)
    assert got[10] == (10, 2, 5)


def test_pq_encode_paths_bit_identical_and_adc_orders(spark):
    from dlt_spark.dataops.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cbs = pq_codebooks(df, num_subspaces=4, num_codes=8)
    a = {r[0]: list(r[1]) for r in pq_encode(df, cbs, use_arrow=True).select("vec_id", "_pq_codes").collect()}
    b = {r[0]: list(r[1]) for r in pq_encode(df, cbs, use_arrow=False).select("vec_id", "_pq_codes").collect()}
    assert a == b  # Arrow kernel == Column/SQL-mirror path, bit-exact

    # ADC top-k: the query itself (a row in the table) must rank first
    # with ~zero distance when it is one of the codebook seeds' nearest
    q = rows[3][1]
    enc = pq_encode(df, cbs)
    top = pq_adc_topk(enc, cbs, q, k=5).collect()
    assert len(top) == 5
    assert top[0]["approx_dist"] <= top[-1]["approx_dist"]
    assert 3 in [r["vec_id"] for r in top]  # own row among nearest


def test_semantic_dedup_cell_cap_stays_linear_and_consistent(spark):
    from dlt_spark.dataops.similarity import semantic_dedup

    # 300 near-identical vectors (one dup group) + 50 distinct -> one
    # degenerate cell; with a small cap the group still resolves to few
    # survivors because sub-cells confine but do not split exact ties...
    import math

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]
    # 50 rays 0.1 rad apart: pairwise cosine <= cos(0.1) ~ 0.995 < thr
    rows += [
        (1000 + i, [math.cos(0.1 * i + 1.0), math.sin(0.1 * i + 1.0), 0.5, 0.0])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = semantic_dedup(
        df, num_centroids=2, threshold=0.9999, max_cell_size=None
    )
    capped = semantic_dedup(
        df, num_centroids=2, threshold=0.9999, max_cell_size=50
    )
    n_un, n_cap = uncapped.count(), capped.count()
    # uncapped: duplicate group collapses to 1 survivor (+ distinct rows)
    assert n_un == 51
    # capped: one survivor PER SUB-CELL of the hot group (approximation
    # bound: at most ceil(350/50)=7 sub-cells if every row shares the
    # cell), never the whole group
    assert 51 <= n_cap <= 51 + 7
    # sub-cell assignment is deterministic: same result on a different layout
    again = semantic_dedup(
        df.repartition(7), num_centroids=2, threshold=0.9999, max_cell_size=50
    )
    assert sorted(r["vec_id"] for r in capped.collect()) == sorted(
        r["vec_id"] for r in again.collect()
    )


def test_dsir_logratio_separates_target_like_docs(spark):
    """Docs sharing the target set's vocabulary must score higher than
    docs sharing the source-only vocabulary."""
    from dlt_spark.dataops.lm import dsir_logratio

    rows = [
        (1, "alpha beta alpha beta", True),
        (2, "alpha beta gamma", True),
        (3, "zeta eta zeta eta", False),
        (4, "zeta eta theta", False),
        (5, "alpha beta alpha", False),   # target-like but unlabeled
        (6, "zeta eta zeta", False),      # source-like
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r["doc_id"]: r for r in dsir_logratio(df, "doc_id", "text", "is_t").collect()}
    assert out[5]["dsir_nano"] > 0 > out[6]["dsir_nano"]
    assert out[1]["dsir_nano"] > out[3]["dsir_nano"]
    assert out[5]["n_toks"] == 3


def test_token_pmi_finds_collocation(spark):
    from dlt_spark.dataops.assoc import token_pmi

    # "neural network" always co-occur; "random noise" words never pair
    docs = [(i, "neural network layer") for i in range(10)]
    docs += [(100 + i, "random walk") for i in range(5)]
    docs += [(200 + i, "noise floor") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = token_pmi(df, "doc_id", "text", min_count=3, top_k=10).collect()
    pairs = {(r["token_a"], r["token_b"]): r for r in out}
    assert ("network", "neural") in pairs or ("neural", "network") in pairs
    key = ("network", "neural") if ("network", "neural") in pairs else ("neural", "network")
    r = pairs[key]
    assert r["n_ab"] == 10
    # perfect within-corpus association but not corpus-wide -> npmi < 1
    assert 0 < r["npmi_nano"] <= 1_000_000_000


def test_skipgram_counts_window_semantics(spark):
    from dlt_spark.dataops.assoc import skipgram_counts

    df = spark.createDataFrame([(1, "a b c a b")], "id long, text string")
    out = {
        (r["token_a"], r["token_b"]): r["n"]
        for r in skipgram_counts(df, "id", "text", window=2, min_count=1, top_k=10).collect()
    }
    # offsets 1: (a,b)(b,c)(c,a)(a,b); offset 2: (a,c)(b,a)(c,b)
    assert out[("a", "b")] == 3
    assert out[("a", "c")] == 2
    assert out[("b", "c")] == 2
    # window=1 drops the distance-2 pairs
    out1 = {
        (r["token_a"], r["token_b"]): r["n"]
        for r in skipgram_counts(df, "id", "text", window=1, min_count=1, top_k=10).collect()
    }
    assert out1 == {("a", "b"): 2, ("b", "c"): 1, ("a", "c"): 1}
