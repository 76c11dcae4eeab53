"""Unit tests for preference (Bradley-Terry), conversation assembly,
and tokenizer-statistics dataops."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dlt_spark.dataops.conversation import assemble_conversations
from dlt_spark.dataops.preference import bt_scores, preference_counts
from dlt_spark.dataops.tokenizer import bpe_pair_counts, top_bpe_pairs, word_freq


# ------------------------------------------------------------ bradley-terry


def test_bt_ranking_matches_dominance(spark):
    """A dominates B dominates C -> strict score ordering; scores
    rescale to mean 1.0 (sum of micros == n_items * 1e6 +- rounding)."""
    rows = [("A", "B")] * 9 + [("B", "A")] * 1 + [("B", "C")] * 9 + [("C", "B")] * 1
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {
        r["item"]: r
        for r in bt_scores(preference_counts(df, "winner", "loser"), iterations=3).collect()
    }
    assert out["A"]["score_micro"] > out["B"]["score_micro"] > out["C"]["score_micro"]
    assert out["A"]["wins"] == 9 and out["C"]["wins"] == 1
    assert out["B"]["comparisons"] == 20
    total = sum(r["score_micro"] for r in out.values())
    assert abs(total - 3_000_000) <= 3  # rescaled each iteration


def test_bt_symmetric_input_is_uniform(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"), ("B", "C"), ("C", "B")],
        "winner string, loser string",
    )
    out = bt_scores(preference_counts(df, "winner", "loser"), iterations=4).collect()
    assert {r["score_micro"] for r in out} == {1_000_000}


def test_bt_weighted_counts_equal_repeated_rows(spark):
    reps = spark.createDataFrame(
        [("A", "B")] * 5 + [("B", "A")] * 2, "winner string, loser string"
    )
    weighted = spark.createDataFrame(
        [("A", "B", 5), ("B", "A", 2)], "winner string, loser string, k long"
    )
    a = bt_scores(preference_counts(reps, "winner", "loser")).collect()
    b = bt_scores(preference_counts(weighted, "winner", "loser", "k")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------ conversations


def _ts(minute: float):
    return dt.datetime(2024, 1, 1, 10) + dt.timedelta(minutes=minute)


def test_conversation_sessions_turns_violations(spark):
    rows = [
        # session 1: user>assistant>assistant>user  (one violation,
        # 3 turns after collapsing the assistant run)
        (1, _ts(0), 1, "user"),
        (1, _ts(1), 2, "assistant"),
        (1, _ts(2), 3, "assistant"),
        (1, _ts(3), 4, "user"),
        # >30 min gap -> session 2, clean alternation
        (1, _ts(60), 5, "user"),
        (1, _ts(61), 6, "assistant"),
        # second user, single-message session
        (2, _ts(0), 7, "user"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, role string")
    out = {
        (r["user"], r["session_seq"]): r
        for r in assemble_conversations(df, "user_id", "ts", "role", "event_id").collect()
    }
    s1 = out[(1, 1)]
    assert s1["n_messages"] == 4 and s1["n_turns"] == 3 and s1["n_violations"] == 1
    assert s1["transcript"] == "user>assistant>assistant>user"
    assert s1["started_at"] == _ts(0) and s1["ended_at"] == _ts(3)
    s2 = out[(1, 2)]
    assert s2["n_messages"] == 2 and s2["n_turns"] == 2 and s2["n_violations"] == 0
    assert out[(2, 1)]["n_turns"] == 1


def test_conversation_ties_break_on_id(spark):
    t = _ts(0)
    df = spark.createDataFrame(
        [(1, t, 2, "b"), (1, t, 1, "a")], "user_id long, ts timestamp, event_id long, role string"
    )
    out = assemble_conversations(df, "user_id", "ts", "role", "event_id").collect()[0]
    assert out["transcript"] == "a>b"


# ------------------------------------------------------------ tokenizer


def test_word_freq_and_pair_counts(spark):
    df = spark.createDataFrame([("ab ab ba",), ("  AB  x ",)], "text string")
    wf = {r["word"]: r["freq"] for r in word_freq(df, "text").collect()}
    assert wf == {"ab": 3, "ba": 1, "x": 1}
    pc = {r["pair"]: r["n"] for r in bpe_pair_counts(word_freq(df, "text")).collect()}
    # 'ab' appears in word 'ab' (freq 3) and nowhere else; 'ba' in 'ba'
    assert pc == {"ab": 3, "ba": 1}


def test_top_bpe_pairs_rank_and_multichar_words(spark):
    df = spark.createDataFrame([("abc abc abd",)], "text string")
    out = top_bpe_pairs(df, "text", k=10).collect()
    by_pair = {r["pair"]: (r["n"], r["rank"]) for r in out}
    # 'ab' occurs in every word (3), 'bc' twice, 'bd' once
    assert by_pair["ab"] == (3, 1)
    assert by_pair["bc"] == (2, 2)
    assert by_pair["bd"] == (1, 3)
    # k cap respected and ranks are dense from 1
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )


def test_bt_scores_match_numpy_mm_reference(spark):
    """The distributed MM fit must track a dense NumPy implementation of
    the same quantized recipe to the last micro-unit."""
    import random

    import numpy as np

    rnd = random.Random(7)
    items = list("ABCDE")
    counts = {}
    for _ in range(60):
        i, j = rnd.sample(items, 2)
        counts[(i, j)] = counts.get((i, j), 0) + 1
    rows = [(w, l, n) for (w, l), n in counts.items()]
    df = spark.createDataFrame(rows, "winner string, loser string, n long")

    from dlt_spark.dataops.preference import bt_scores, preference_counts

    got = {
        r["item"]: r["score_micro"]
        for r in bt_scores(preference_counts(df, "winner", "loser", "n"), iterations=3).collect()
    }

    # dense reference with the identical integer quantization
    idx = {it: k for k, it in enumerate(items)}
    n_ij = np.zeros((5, 5), dtype=np.int64)
    wins = np.zeros(5, dtype=np.int64)
    for (w, l), c in counts.items():
        n_ij[idx[w], idx[l]] += c
        n_ij[idx[l], idx[w]] += c
        wins[idx[w]] += c
    s = np.full(5, 1_000_000, dtype=np.int64)
    for _ in range(3):
        denom = np.zeros(5, dtype=np.int64)
        for a in range(5):
            for b in range(5):
                if a != b and n_ij[a, b]:
                    denom[a] += round(
                        n_ij[a, b] / (s[a] / 1e6 + s[b] / 1e6) * 1e9
                    )
        raw = np.array(
            [round(wins[a] / (denom[a] / 1e9) * 1e6) for a in range(5)], dtype=np.int64
        )
        tot = raw.sum()
        s = np.array(
            [max(round(float(raw[a]) * 5.0 * 1e6 / float(tot)), 1) for a in range(5)],
            dtype=np.int64,
        )
    for it in items:
        assert got[it] == s[idx[it]], (it, got[it], int(s[idx[it]]))


def test_bt_all_loss_item_stays_finite(spark):
    """An item that never wins must keep an epsilon score (never 0),
    and a comparison graph containing it must not produce NULL/Inf."""
    rows = [("A", "Z")] * 5 + [("B", "Z")] * 5 + [("A", "B"), ("B", "A")]
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {
        r["item"]: r["score_micro"]
        for r in bt_scores(preference_counts(df, "winner", "loser"), iterations=4).collect()
    }
    assert out["Z"] >= 1
    assert all(v is not None and v >= 1 for v in out.values())
    assert out["A"] > out["Z"] and out["B"] > out["Z"]


def test_best_of_n_selection_and_margin(spark):
    from dlt_spark.dataops.preference import best_of_n

    rows = [
        ("p1", "c1", 0.9), ("p1", "c2", 0.7), ("p1", "c3", 0.7),
        ("p2", "c9", 0.5),
        ("p3", "c4", 0.3), ("p3", "c5", 0.3),  # tie -> lower id wins
    ]
    df = spark.createDataFrame(rows, "prompt string, cand string, score double")
    out = {r["group"]: r for r in best_of_n(df, "prompt", "cand", "score").collect()}
    assert out["p1"]["best"] == "c1" and abs(out["p1"]["margin"] - 0.2) < 1e-9
    assert out["p1"]["n_candidates"] == 3
    assert out["p2"]["margin"] is None and out["p2"]["n_candidates"] == 1
    assert out["p3"]["best"] == "c4" and out["p3"]["margin"] == 0.0


def test_rater_agreement_kappa_known_values(spark):
    from dlt_spark.dataops.preference import rater_agreement

    # raters 1,2 agree perfectly on varied labels -> kappa 1;
    # raters 1,3: rater 3 constant -> kappa 0 region
    rows = []
    for i in range(12):
        lab = "x" if i % 2 == 0 else "y"
        rows += [(i, 1, lab), (i, 2, lab), (i, 3, "x")]
    df = spark.createDataFrame(rows, "item long, rater long, label string")
    out = {
        (r["rater_a"], r["rater_b"]): r
        for r in rater_agreement(df, "item", "rater", "label", min_common=5).collect()
    }
    assert out[(1, 2)]["kappa_nano"] == 1_000_000_000
    assert out[(1, 2)]["n_agree"] == 12
    # constant rater: p_o = p_e = 0.5 -> kappa 0
    assert out[(1, 3)]["kappa_nano"] == 0
    # both constant and identical -> p_e = 1 -> kappa 0 by convention
    rows2 = [(i, 1, "z") for i in range(8)] + [(i, 2, "z") for i in range(8)]
    df2 = spark.createDataFrame(rows2, "item long, rater long, label string")
    out2 = rater_agreement(df2, "item", "rater", "label", min_common=5).collect()
    assert out2[0]["kappa_nano"] == 0 and out2[0]["n_agree"] == 8
