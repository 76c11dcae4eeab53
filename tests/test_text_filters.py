"""Unit tests for repetition signals, PII redaction, and the
Gopher-style document filter (dataops/text.py) with hand-computed
expected values."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_spark.dataops.text import (
    dup_line_fraction,
    dup_ngram_fraction,
    gopher_filter,
    pii_counts,
    redact_pii,
    repetition_signals,
    top_ngram_fraction,
    word_ngrams,
)


def _one(spark, text, col):
    return spark.createDataFrame([Row(text=text)]).select(col.alias("v")).collect()[0]["v"]


def test_word_ngrams_keep_multiplicity(spark):
    got = _one(spark, "a b a b a", word_ngrams(F.col("text"), 2))
    assert got == ["a b", "b a", "a b", "b a"]


def test_dup_line_fraction(spark):
    # 4 lines, 2 distinct -> (4-2)/4
    assert _one(spark, "x\ny\nx\ny", dup_line_fraction(F.col("text"))) == 0.5
    assert _one(spark, "only one line", dup_line_fraction(F.col("text"))) == 0.0


def test_dup_ngram_fraction(spark):
    # 2-grams of "a b a b a": [a b, b a, a b, b a] -> (4-2)/4
    assert _one(spark, "a b a b a", dup_ngram_fraction(F.col("text"), 2)) == 0.5
    assert _one(spark, "w x y z", dup_ngram_fraction(F.col("text"), 2)) == 0.0


def test_top_ngram_fraction(spark):
    # "a b a b a b": top 2-gram "a b" occurs 3x -> 3*2/6 = 1.0
    assert _one(spark, "a b a b a b", top_ngram_fraction(F.col("text"), 2)) == 1.0
    # "p q r s": every 2-gram unique -> 1*2/4 = 0.5
    assert _one(spark, "p q r s", top_ngram_fraction(F.col("text"), 2)) == 0.5


def test_repetition_signals_columns(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b a b a")])
    row = repetition_signals(df).collect()[0]
    assert row["dup_2gram_frac"] == 0.5 and row["dup_line_frac"] == 0.0


def test_redact_pii(spark):
    raw = "mail bob.smith+x@corp.example.org or 192.168.0.1 or +14155550123 end"
    got = _one(spark, raw, redact_pii(F.col("text")))
    assert got == "mail <EMAIL> or <IP> or <PHONE> end"


def test_pii_counts(spark):
    raw = "a@b.co c@d.io 10.0.0.1 +1234567890"
    df = spark.createDataFrame([Row(text=raw)]).select(
        *[v.alias(k) for k, v in pii_counts(F.col("text")).items()]
    )
    row = df.collect()[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (2, 1, 1)


def test_redact_order_email_before_ip(spark):
    # the dotted-digits inside an email must not be double-redacted
    got = _one(spark, "u1.2.3.4@ex.com", redact_pii(F.col("text")))
    assert got == "<EMAIL>"


def test_gopher_filter_rules(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    symbol_soup = "# " * 12 + "the end of it all now here gone"
    short = "too short"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=good), Row(doc_id=2, text=symbol_soup), Row(doc_id=3, text=short)]
    )
    out = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["r_symbol"] is False
    assert out[3]["keep"] is False and out[3]["r_len"] is False


def test_gopher_alpha_rule(spark):
    digits = "11 22 33 44 55 66 77 88 99 00 12 34"
    df = spark.createDataFrame([Row(text=digits)])
    row = gopher_filter(df).collect()[0]
    assert row["r_alpha"] is False and row["keep"] is False


def test_boilerplate_lines_and_removal(spark):
    from pyspark.sql import Row
    from dlt_spark.dataops.text import boilerplate_lines, remove_boilerplate

    docs = spark.createDataFrame([
        Row(doc_id=1, text="unique one\nCOOKIE BANNER\nreal content a"),
        Row(doc_id=2, text="COOKIE BANNER\nreal content b"),
        Row(doc_id=3, text="COOKIE BANNER\nreal content c\nCOOKIE BANNER"),
        Row(doc_id=4, text="COOKIE BANNER"),
    ])
    bp = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs, min_docs=3).collect()}
    assert bp == {"COOKIE BANNER": 4}  # distinct docs, not occurrences

    out = {r["doc_id"]: r["clean_text"] for r in remove_boilerplate(docs, min_docs=3).collect()}
    assert out[1] == "unique one\nreal content a"
    assert out[2] == "real content b"
    assert out[3] == "real content c"
    assert out[4] == ""  # all-boilerplate doc is kept, emptied


def test_remove_boilerplate_preserves_line_order(spark):
    from pyspark.sql import Row
    from dlt_spark.dataops.text import remove_boilerplate

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"z last {i}\nBP\na first {i}\nBP\nm mid {i}") for i in range(3)]
    )
    out = {r["doc_id"]: r["clean_text"] for r in remove_boilerplate(docs, min_docs=3).collect()}
    assert out[0] == "z last 0\na first 0\nm mid 0"
    assert out[2] == "z last 2\na first 2\nm mid 2"


def test_cross_doc_repeated_fraction(spark):
    from dlt_spark.dataops.text import cross_doc_repeated_fraction

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, shared + " unique one tail words here"),
            (2, shared + " other totally different ending text"),
            (3, "completely independent document with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in cross_doc_repeated_fraction(df, n=4).collect()}
    # docs 1/2 share the 8-token prefix: its 5 full 4-gram starts repeat
    assert out[1]["rep_pos"] == 5
    assert out[2]["rep_pos"] == 5
    assert out[3]["rep_pos"] == 0
    assert out[3]["repeated_frac"] == 0.0
    assert 0 < out[1]["repeated_frac"] < 1


def test_char_entropy_orders_spam_below_language(spark):
    from dlt_spark.dataops.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaa"), (2, "abababababab"), (3, "the quick brown fox")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_nano"] == 0  # single symbol
    # two equiprobable symbols -> ln 2
    assert abs(out[2]["entropy_nano"] - 693_147_181) <= 12
    assert out[3]["entropy_nano"] > out[2]["entropy_nano"] > out[1]["entropy_nano"]
    assert out[3]["n_chars"] == 19


def test_char_entropy_counts_unicode_and_whitespace_per_codepoint(spark):
    # pins the r10 split('')-based char extraction: multi-byte codepoints
    # count once each, whitespace is a symbol, and n_chars == length()
    from dlt_spark.dataops.text import char_entropy

    df = spark.createDataFrame(
        [(1, "é漢é"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["n_chars"] == 3  # é, 漢, é — codepoints, not bytes
    # p(é)=2/3, p(漢)=1/3 -> H = ln3 - (2/3)ln2 in nats
    import math

    expect = round((math.log(3) - (2 / 3) * math.log(2)) * 1e9)
    assert abs(out[1]["entropy_nano"] - expect) <= 12
    assert out[2]["n_chars"] == 3  # space is a counted symbol
    # three distinct equiprobable symbols -> ln 3
    assert abs(out[2]["entropy_nano"] - round(math.log(3) * 1e9)) <= 12
    assert out[3]["entropy_nano"] == 0 and out[3]["n_chars"] == 1
