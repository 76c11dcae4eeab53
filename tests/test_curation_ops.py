"""Tests for the round-3 curation operators: benchmark decontamination,
sequence packing, stratified sampling, and their scale-shape guarantees.
These are beyond-reference dataops (SURVEY §2.L) — no dlt analog."""

import pytest
from pyspark.sql import Row, functions as F

from dlt_spark.dataops.contamination import (
    decontaminate,
    ngram_overlap,
    word_ngram_set,
)
from dlt_spark.dataops.packing import pack_sequences, sequences_needed
from dlt_spark.dataops.sampling import stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="pack my box with five dozen liquor jugs"),
        Row(doc_id=3, text="the quick brown fox jumps over a sleeping cat"),
        Row(doc_id=4, text="completely unrelated text with no shared grams"),
        Row(doc_id=5, text="short"),
    ]
    return spark.createDataFrame(rows)


def test_word_ngram_set_basics(spark, docs):
    out = docs.select("doc_id", word_ngram_set(F.col("text"), 3).alias("g"))
    got = {r["doc_id"]: r["g"] for r in out.collect()}
    assert got[1][0] == "the quick brown"
    assert len(got[1]) == 7  # 9 tokens -> 7 trigrams
    assert got[5] == ["short"]  # shorter than n -> one truncated gram


def test_ngram_overlap_and_decontaminate(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    flagged = ngram_overlap(corpus, bench, n=3)
    got = {r["id"]: r["overlap_ngrams"] for r in flagged.collect()}
    # doc 3 shares "the quick brown", "quick brown fox", "brown fox jumps",
    # "fox jumps over" with doc 1; docs 2/4/5 share nothing
    assert set(got) == {3}
    assert got[3] == 4
    clean = decontaminate(corpus, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4, 5]


def test_decontaminate_threshold(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    # doc 3 overlap: 4/7 grams ≈ 0.571 — survives a 0.6 threshold
    loose = decontaminate(corpus, bench, n=3, max_overlap_frac=0.6)
    assert sorted(r["doc_id"] for r in loose.collect()) == [2, 3, 4, 5]


def test_pack_sequences_invariants(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90 + 10).alias("n_toks")
    )
    packed = pack_sequences(df, "doc_id", "n_toks", seq_len=128, num_shards=4)
    rows = packed.collect()
    assert len(rows) == 300
    for r in rows:
        assert 0 <= r["shard"] < 4
        assert r["begin_offset"] < 128
        assert r["end_seq"] >= r["begin_seq"]
    # per shard: ordered by id, sequences tile the token stream exactly
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["id"])):
        cum = by_shard.get(r["shard"], 0)
        assert r["begin_seq"] % (1 << 40) == cum // 128
        assert r["begin_offset"] == cum % 128
        by_shard[r["shard"]] = cum + r["n_tokens"]
    summary = sequences_needed(packed).collect()
    assert {r["shard"] for r in summary} == {0, 1, 2, 3}
    for s in summary:
        total = by_shard[s["shard"]]
        assert s["tokens"] == total
        assert s["sequences"] == (total - 1) // 128 + 1


def test_pack_sequences_deterministic_across_partitionings(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit(37).alias("n_toks")
    )
    a = pack_sequences(df.repartition(1), "doc_id", "n_toks", 64, 8).collect()
    b = pack_sequences(df.repartition(13), "doc_id", "n_toks", 64, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(0, 6000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "fr")
        .otherwise("zz")
        .alias("lang"),
    )
    out = stratified_sample(df, "id", "lang", {"en": 0.5, "fr": 1.0}).collect()
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang.get("fr") == 2000  # rate 1.0 keeps everything
    assert "zz" not in by_lang  # default rate 0.0 drops the stratum
    assert 850 <= by_lang.get("en", 0) <= 1150  # ~50% of 2000
    again = stratified_sample(df, "id", "lang", {"en": 0.5, "fr": 1.0}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_cap_per_group_keeps_at_most_cap(spark):
    from dlt_spark.dataops.sampling import cap_per_group

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("grp")
    )
    out = cap_per_group(df, "id", "grp", 20).collect()
    counts = {}
    for r in out:
        counts[r["grp"]] = counts.get(r["grp"], 0) + 1
    assert all(c == 20 for c in counts.values())  # every group has >20 rows
    # deterministic: same kept set on rerun and under different partitioning
    again = cap_per_group(df.repartition(11), "id", "grp", 20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # growth stability: adding rows keeps most of the old selection
    grown = spark.range(0, 1100).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("grp")
    )
    kept_old = {tuple(r) for r in out}
    kept_new = {tuple(r) for r in cap_per_group(grown, "id", "grp", 20).collect()}
    assert len(kept_old & kept_new) >= 100  # of 140


def test_clean_text(spark):
    from dlt_spark.dataops.text import clean_text

    df = spark.createDataFrame(
        [(1, "  a\t\tb\x07c\nd  "), (2, "already clean"), (3, "\x00\x01")],
        "id long, t string",
    )
    got = {r["id"]: r["c"] for r in df.select("id", clean_text(F.col("t")).alias("c")).collect()}
    assert got[1] == "a bc d"
    assert got[2] == "already clean"
    assert got[3] == ""


def test_rollup_merge_equals_recompute(spark):
    """Incremental refresh invariant: merging per-batch states equals
    recomputing the rollup over the union — exactly."""
    from dlt_spark.dataops.rollup import rollup_finalize, rollup_merge, rollup_state

    df = spark.range(0, 5000).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 97).alias("ts"),
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 1000 / 7.0).alias("v"),
    )
    whole = rollup_state(df, "ts", ["k"], "v", 3600)
    parts = [
        rollup_state(df.filter(F.col("v") < 50), "ts", ["k"], "v", 3600),
        rollup_state(df.filter(F.col("v") >= 50), "ts", ["k"], "v", 3600),
    ]
    merged = rollup_merge(*parts)
    a = sorted(map(tuple, rollup_finalize(whole).collect()))
    b = sorted(map(tuple, rollup_finalize(merged).collect()))
    assert a == b
    # three-way merge associativity
    thirds = [
        rollup_state(df.filter(F.col("id") % 3 == i), "ts", ["k"], "v", 3600)
        for i in range(3)
    ]
    c = sorted(map(tuple, rollup_finalize(rollup_merge(*thirds)).collect()))
    assert a == c


def test_percentile_tiers_scan_shaped(spark):
    from dlt_spark.dataops.sampling import percentile_tiers

    df = spark.range(0, 1000).select((F.col("id") / 10.0).alias("v"))
    out = percentile_tiers(df, "v", tiles=4)
    counts = {r["tier"]: r["n"] for r in out.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert all(200 <= c <= 300 for c in counts.values())  # ~250 each
    # tier 1 holds the highest values
    top = out.filter(F.col("tier") == 1).agg(F.min("v")).collect()[0][0]
    bot = out.filter(F.col("tier") == 4).agg(F.max("v")).collect()[0][0]
    assert top > bot
    # no global single-partition window in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_mix_corpus_hits_target_proportions(spark):
    from dlt_spark.dataops.sampling import mix_corpus

    df = spark.range(0, 30000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 7, "web")
        .when(F.col("id") % 10 < 9, "code")
        .otherwise("books")
        .alias("src"),
    )  # 21k web, 6k code, 3k books
    out = mix_corpus(df, "id", "src", {"web": 0.5, "code": 0.3, "books": 0.2}, 5000)
    by = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert abs(by["web"] - 2500) < 250
    assert abs(by["code"] - 1500) < 200
    assert abs(by["books"] - 1000) < 150
    # scarce stratum keeps everything rather than silently upsampling
    tight = mix_corpus(df, "id", "src", {"web": 0.1, "books": 0.9}, 10000)
    nb = tight.filter(F.col("src") == "books").count()
    assert nb == 3000  # min(1, 9000/3000) -> rate 1.0


def test_sample_exact_k(spark):
    from dlt_spark.dataops.sampling import sample_exact_k

    df = spark.range(0, 5000).select(F.col("id"))
    out = sample_exact_k(df, "id", 100).collect()
    assert len(out) == 100
    again = sample_exact_k(df.repartition(13), "id", 100).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # bounded turnover under growth
    grown = sample_exact_k(spark.range(0, 5500).select(F.col("id")), "id", 100).collect()
    kept = {r["id"] for r in out} & {r["id"] for r in grown}
    assert len(kept) >= 80


def test_chunk_documents_reconstruction(spark):
    from dlt_spark.dataops.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "tiny doc")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["id"], r["chunk_idx"])):
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: ceil((100-8)/24) = 4 chunks, strides of 24, window 32
    assert len(by_doc[1]) == 4
    assert [r["start_tok"] for r in by_doc[1]] == [0, 24, 48, 72]
    assert by_doc[1][0]["chunk_text"].split()[:2] == ["w0", "w1"]
    assert by_doc[1][-1]["n_tok"] == 28  # tail chunk is short
    # consecutive chunks overlap by 8 tokens
    a = by_doc[1][0]["chunk_text"].split()
    b = by_doc[1][1]["chunk_text"].split()
    assert a[-8:] == b[:8]
    # short doc: one chunk, whole doc
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "tiny doc"
    # every token position covered
    covered = set()
    for r in by_doc[1]:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(100))


def test_profile_table(spark):
    from dlt_spark.dataops.profiling import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b"), (5, None)],
        "id long, v string",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["id"]["n_rows"] == 5 and rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 5
    assert rows["v"]["n_nulls"] == 2 and rows["v"]["null_frac"] == 0.4
    assert rows["v"]["n_distinct"] == 2
    assert rows["v"]["min_value"] == "a" and rows["v"]["max_value"] == "b"
    # approx path has the same shape
    approx = {r["column"]: r for r in profile(df, exact=False).collect()}
    assert approx["id"]["n_distinct"] >= 4


def test_histogram_bins_and_clamping(spark):
    from dlt_spark.dataops.profiling import histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 1, 9, 10, 55, 99, 150, 150]] + [(None,)],
        "v double",
    )
    bins = {r["bin"]: r for r in histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert bins[0]["n"] == 4  # -5 clamps in; 0, 1, 9
    assert bins[0]["lo_edge"] == 0.0 and bins[0]["hi_edge"] == 10.0
    assert bins[1]["n"] == 1  # 10
    assert bins[5]["n"] == 1  # 55
    assert bins[9]["n"] == 3  # 99 + two 150s clamp to the top bin
    assert sum(r["n"] for r in bins.values()) == 9  # null excluded


def test_remove_repeated_spans_cuts_shared_grams(spark):
    from dlt_spark.dataops.text import remove_repeated_spans

    shared = "one two three four"  # 4-gram shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma delta {shared}"),
            (3, "unique text with no overlap here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(docs, n=4, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "alpha beta"
    assert out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "gamma delta"
    assert out[3]["clean_text"] == "unique text with no overlap here"
    assert out[3]["n_removed"] == 0


def test_remove_repeated_spans_overlapping_spans_merge(spark):
    from dlt_spark.dataops.text import remove_repeated_spans

    # five shared tokens -> two overlapping shared 4-grams; covered
    # positions union, tokens are not double-counted
    shared = "a b c d e"
    docs = spark.createDataFrame(
        [(1, f"x {shared} y"), (2, f"{shared} z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(docs, n=4, min_docs=2).collect()}
    assert out[1]["clean_text"] == "x y"
    assert out[1]["n_removed"] == 5
    assert out[2]["clean_text"] == "z"


def test_remove_repeated_spans_fully_covered_doc_stays(spark):
    from dlt_spark.dataops.text import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(docs, n=4, min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 4


def test_temperature_proportions_flatten_toward_uniform(spark):
    from dlt_spark.dataops.sampling import temperature_proportions

    counts = {"en": 9000, "fr": 900, "sw": 100}
    p1 = temperature_proportions(counts, 1.0)
    p5 = temperature_proportions(counts, 5.0)
    # T=1 is natural proportions
    assert abs(p1["en"] - 0.9) < 1e-12
    # higher temperature boosts the small stratum, shrinks the big one
    assert p5["sw"] > p1["sw"] and p5["en"] < p1["en"]
    assert abs(sum(p5.values()) - 1.0) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_proportions(counts, 0)


def test_mix_corpus_temperature_hits_targets(spark):
    from dlt_spark.dataops.sampling import (
        mix_corpus_temperature,
        temperature_proportions,
    )

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = mix_corpus_temperature(df, "k", "g", temperature=3.0, total_rows=2000)
    got = {r["g"]: r["n"] for r in out.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    props = temperature_proportions({"big": 9000, "small": 1000}, 3.0)
    for g in ("big", "small"):
        target = 2000 * props[g]
        assert abs(got[g] - target) / target < 0.15  # hash sampling tolerance


def test_salted_join_matches_plain_join(spark):
    from dlt_spark.dataset.joins import salted_join

    left = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(2000)], ["pk", "k", "v"]
    )
    # skew: key 0 takes half the rows
    left = left.withColumn("k", F.when(F.col("pk") < 1000, 0).otherwise(F.col("k")))
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(7)], ["k", "name"])
    plain = left.join(right, "k").select("pk", "k", "name")
    salted = salted_join(left, right, ["k"], salt_col="pk", num_salts=8).select(
        "pk", "k", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched rows exactly once
    right_partial = right.filter("k < 3")
    pl = left.join(right_partial, "k", "left").select("pk", "name")
    sl = salted_join(left, right_partial, ["k"], salt_col="pk", num_salts=4, how="left").select("pk", "name")
    assert sorted(map(tuple, pl.collect())) == sorted(map(tuple, sl.collect()))


def test_dedup_lines_global_keeps_first_occurrence(spark):
    from dlt_spark.dataops.text import dedup_lines_global

    shared = "this exact sentence appears in many documents verbatim"
    docs = [
        (1, f"alpha unique opening line of doc one\n{shared}\nshort"),
        (2, f"{shared}\nbeta unique content line of doc two here"),
        (3, f"gamma unique content line of doc three here\n{shared}"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"] for r in dedup_lines_global(df, min_chars=30).collect()}
    # doc 1 (smallest id) keeps the shared line; docs 2 and 3 lose it
    assert shared in out[1]
    assert shared not in out[2] and shared not in out[3]
    # unique lines and short lines survive everywhere
    assert "alpha unique" in out[1] and "short" in out[1]
    assert out[2].startswith("beta") or "beta unique" in out[2]
    assert "gamma unique" in out[3]
