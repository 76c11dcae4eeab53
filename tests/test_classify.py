"""Naive Bayes classifier, embedding covariance, and n-gram diversity
(round-7 dataops additions)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_nb_separable_corpus(spark):
    from dlt_spark.dataops.classify import nb_score, nb_train

    rows = [
        (1, "spark shuffle partition executor", "eng"),
        (2, "executor partition shuffle codegen", "eng"),
        (3, "sourdough flour hydration levain", "baking"),
        (4, "levain flour sourdough crumb", "baking"),
        (5, "shuffle executor spark plan", "eng"),
        (6, "crumb hydration flour bake", "baking"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    priors, lp = nb_train(docs, "source")
    got = {
        r["doc_id"]: (r["predicted"], r["margin_nano"])
        for r in nb_score(docs, priors, lp).collect()
    }
    for did, (pred, margin) in got.items():
        expect = "eng" if did in (1, 2, 5) else "baking"
        assert pred == expect, (did, pred)
        assert margin > 0
    # priors: 3 docs each of 6 -> ln(1/2) * 1e9
    p = {r["label"]: r["prior_nano"] for r in priors.collect()}
    assert p["eng"] == p["baking"]
    import math

    assert abs(p["eng"] - round(math.log(0.5) * 1e9)) <= 1


def test_nb_unseen_token_takes_default(spark):
    from dlt_spark.dataops.classify import nb_score, nb_train

    docs = spark.createDataFrame(
        [(1, "aa aa", "x"), (2, "bb bb", "y")],
        "doc_id long, text string, source string",
    )
    priors, lp = nb_train(docs, "source")
    # a doc of only tokens class y never saw still scores for y via the
    # smoothed default, and x (which saw them) must win
    test = spark.createDataFrame([(9, "aa aa aa", "?")],
                                 "doc_id long, text string, source string")
    out = nb_score(test, priors, lp).collect()
    assert out[0]["predicted"] == "x" and out[0]["margin_nano"] > 0


def test_nb_margin_zero_on_exact_tie(spark):
    from dlt_spark.dataops.classify import nb_score, nb_train

    # perfectly symmetric corpus: identical token stats per class
    docs = spark.createDataFrame(
        [(1, "tok", "a"), (2, "tok", "b")],
        "doc_id long, text string, source string",
    )
    priors, lp = nb_train(docs, "source")
    out = nb_score(docs, priors, lp).collect()
    for r in out:
        assert r["margin_nano"] == 0
        assert r["predicted"] == "b"  # (score, label) max tie-break


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from dlt_spark.dataops.vector import embedding_covariance, top_eigen

    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 5)).astype("float32")
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "embedding array<float>"
    )
    rows = embedding_covariance(df).collect()
    assert len(rows) == 15  # upper triangle of 5x5
    # reconstruct and compare against numpy population covariance of the
    # micro-quantized data (the op is exact w.r.t. its quantization)
    q = np.floor(x.astype("float64") * 1e6 + 0.5)
    cov_np = np.cov(q.T, bias=True) / 1e12
    for r in rows:
        assert abs(r["cov"] - cov_np[r["i"], r["j"]]) < 1e-8, (r, cov_np[r["i"], r["j"]])
    ev, vec = top_eigen(rows, dim=5, iters=500)
    w_np = np.linalg.eigvalsh(cov_np).max()
    # power iteration converges geometrically in the eigengap ratio; a
    # random gaussian covariance has a small gap, so assert to 1e-4
    assert abs(ev - w_np) < 1e-4
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-9


def test_ngram_diversity_exact_counts(spark):
    from dlt_spark.dataops.text import ngram_diversity

    docs = spark.createDataFrame(
        [
            ("a", "x y z x y z"),       # grams: xyz yzx zxy xyz -> 4 total, 3 distinct
            ("a", "x y z"),             # xyz -> total 5, distinct 3 for source a
            ("b", "p q"),               # short doc: one truncated gram "p q"
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in ngram_diversity(docs, "source", n=3).collect()}
    assert out["a"]["total_ngrams"] == 5
    assert out["a"]["distinct_ngrams"] == 3
    assert abs(out["a"]["diversity"] - 0.6) < 1e-12
    assert out["b"]["total_ngrams"] == 1 and out["b"]["distinct_ngrams"] == 1


def test_ngram_diversity_sketch_path(spark):
    from dlt_spark.dataops.text import ngram_diversity

    docs = spark.createDataFrame(
        [("a", "x y z x y z"), ("a", "x y z"), ("b", "p q")],
        "source string, text string",
    )
    exact = {r["source"]: r for r in ngram_diversity(docs, "source").collect()}
    approx = {r["source"]: r for r in
              ngram_diversity(docs, "source", exact=False).collect()}
    for s in exact:
        assert approx[s]["total_ngrams"] == exact[s]["total_ngrams"]
        # HLL at rsd=0.01 is exact for tiny cardinalities
        assert approx[s]["distinct_ngrams"] == exact[s]["distinct_ngrams"]


def test_lsh_params_s_curve():
    from dlt_spark.dataops.dedup import lsh_params

    # classic textbook point: 128 perms at t=0.5 lands near b=16, r=8
    b, r = lsh_params(0.5, 128)
    assert b * r == 128
    assert 8 <= b <= 32
    # higher threshold -> more rows per band (steeper curve, fewer FPs)
    b_hi, r_hi = lsh_params(0.9, 128)
    assert r_hi > r
    # the implied 50%-candidacy similarity (1/b)^(1/r) brackets the target
    t50 = (1.0 / b) ** (1.0 / r)
    assert 0.3 < t50 < 0.7
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_params(1.5, 128)


def test_bpe_apply_matches_python_replay(spark):
    """bpe_apply's chained two-pass replaces must reproduce a direct
    Python replay of the same merge procedure per word occurrence."""
    from dlt_spark.dataops.tokenizer import bpe_apply, bpe_train

    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "low new wider wide"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, merges=3)
    out = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}

    def encode(word):
        s = " " + " ".join(word) + " "
        for m in merges:
            pat = f" {m['pair_left']} {m['pair_right']} "
            rep = f" {m['pair_left']}{m['pair_right']} "
            s = s.replace(pat, rep).replace(pat, rep)
        return len(s.split())

    for did, text in rows:
        words = [w for w in text.lower().split() if w.isalnum()]
        assert out[did]["n_words"] == len(words)
        assert out[did]["n_tokens"] == sum(encode(w) for w in words), did


def test_embedding_quantize_report(spark):
    import numpy as np

    from dlt_spark.dataops.vector import quantize_embeddings_report

    vecs = [
        (1, [0.5, -0.25, 0.125, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),      # zero vector: maxabs 0, zero error
        (3, [1.0, -1.0, 0.5, -0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings_report(df).collect()}
    assert out[2]["maxabs_q6"] == 0 and out[2]["sum_err_q"] == 0
    for vid, v in [(1, vecs[0][1]), (3, vecs[2][1])]:
        q = np.floor(np.array(v) * 1e6 + 0.5)
        ma = np.abs(q).max()
        code = np.floor(q * 127.0 / ma + 0.5)
        assert np.all(np.abs(code) <= 127)
        err = np.floor((q - code * ma / 127.0) ** 2 + 0.5).sum()
        assert out[vid]["sum_err_q"] == int(err), vid
        assert out[vid]["maxabs_q6"] == int(ma)
        # mse is EXACT integer half-up division re-cast to double —
        # round(double, 12) diverged from DuckDB by one ULP on 2 of
        # 2000 sf0.1 vectors (r9 full-scale hash sweep); the integer
        # form is engine-portable bit-for-bit
        n = len(v)
        assert out[vid]["mse"] == float((2 * int(err) + n) // (2 * n)) / 1e12, vid


def test_ngram_novelty_exact(spark):
    from dlt_spark.dataops.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # grams: 'a b c', 'b c d'
            (2, "a b c x"),       # grams: 'a b c', 'b c x'
            (3, "p q r s"),       # grams: 'p q r', 'q r s' (all novel)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["novel_grams"] == 1
    assert out[2]["novel_grams"] == 1
    assert out[3]["novelty"] == 1.0


def test_bpe_encode_oracle_degenerate_corpus(spark, tmp_path):
    """Gate parity when bpe_train finds fewer than 4 merges: the oracle
    twins' tN CTEs fall back to a sentinel no-op pair instead of
    cross-joining the doc chain against an empty frame (which returned
    zero rows — a guaranteed driver mismatch)."""
    import duckdb

    import __spark_entry__ as entry

    for name, text in (
        ("zero", "a b c"),       # all single-symbol words: 0 merges
        ("one", "ab ab c"),      # exactly one trainable merge
    ):
        d = tmp_path / name
        docs = spark.createDataFrame(
            [(i, text) for i in range(5)], "doc_id long, text string"
        )
        docs.write.parquet(str(d / "documents.parquet"))
        out = (
            entry.queries()["bpe_encode"](spark, str(d))
            .orderBy("doc_id")
            .collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('"
            + str(d / "documents.parquet") + "/*.parquet')"
        )
        oracle = con.execute(
            entry.oracle_sql()["bpe_encode"]
        ).fetchall()
        assert len(out) == len(oracle) == 5, (name, len(out), len(oracle))
        got = sorted(tuple(r) for r in out)
        want = sorted(tuple(r) for r in oracle)
        assert got == want, (name, got[:2], want[:2])


def test_nb_train_stamps_model_rows_and_score_adds_no_count_job(spark):
    """nb_train stamps vocab*classes on the model frame; nb_score gates
    its broadcast on the stamp with NO extra count() action."""
    from dlt_spark.dataops.classify import nb_score, nb_train

    rows = [
        (1, "alpha beta gamma", "x"),
        (2, "beta gamma delta", "y"),
        (3, "alpha delta", "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    priors, lp = nb_train(docs, "source")
    vocab = {"alpha", "beta", "gamma", "delta"}
    assert lp._nb_model_rows == len(vocab) * 2
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    scored = nb_score(docs, priors, lp)
    mid = len(sc.statusTracker().getJobIdsForGroup(None))
    assert mid == before, "nb_score must launch zero jobs before the action"
    assert scored.count() == 3


def test_bpe_apply_paths_agree_at_64_merges(spark):
    """The chained-replace and vocab-collapse paths replay identical
    two-pass replace semantics — at merges >= 64 (the chain cap) both
    must produce the same per-doc token accounting."""
    import random

    from dlt_spark.dataops.tokenizer import bpe_apply

    rng = random.Random(7)
    alphabet = "abcdefgh"
    rows = [
        (i, " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12)))
            for _ in range(rng.randint(3, 20))
        ))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # synthetic 80-merge table: single chars, then grown symbols —
    # many will fire on real words, some won't (no-ops must be safe)
    merges = []
    grown = list(alphabet)
    for r in range(80):
        a = grown[r % len(grown)]
        b = alphabet[(r * 3 + 1) % len(alphabet)]
        merges.append(
            {"rank": r + 1, "pair_left": a, "pair_right": b, "n": 100 - r}
        )
        grown.append(a + b)
    chain = bpe_apply(docs, merges, chain_merge_limit=1000).collect()
    vocab = bpe_apply(docs, merges, chain_merge_limit=0).collect()
    assert [tuple(r) for r in chain] == [tuple(r) for r in vocab]
    # and the default limit routes an 80-merge table to the vocab path
    assert len(merges) > 64


def test_nb_score_explicit_model_rows_survives_cache(spark):
    """ADVICE r8: the _nb_model_rows stamp dies on any transformation /
    cache round-trip — the explicit model_rows parameter restores the
    broadcast gate for stored or post-processed models (and the scores
    are identical either way)."""
    from dlt_spark.dataops.classify import nb_score, nb_train

    rows = [
        (1, "alpha beta gamma", "x"),
        (2, "beta gamma delta", "y"),
        (3, "alpha delta", "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    priors, lp = nb_train(docs, "source")
    # a post-processed model frame loses the stamp
    lp2 = lp.filter("label IS NOT NULL")
    assert not hasattr(lp2, "_nb_model_rows")
    base = sorted(tuple(r) for r in nb_score(docs, priors, lp).collect())

    def _opt(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    gated = nb_score(docs, priors, lp2, model_rows=8)
    # over-limit explicit count suppresses the model hint; the lineage
    # carries other hints (class list, nb_train internals), so compare
    # RELATIVE counts: explicit small model_rows adds exactly one
    wide = nb_score(docs, priors, lp2, model_rows=10**9)
    n_gated = _opt(gated).count("strategy=broadcast")
    n_wide = _opt(wide).count("strategy=broadcast")
    assert n_gated == n_wide + 1, (n_gated, n_wide)
    assert sorted(tuple(r) for r in gated.collect()) == base
    assert sorted(tuple(r) for r in wide.collect()) == base
