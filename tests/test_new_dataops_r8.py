"""Round-8 dataops: boundary overlap, Zipf slope, confusion matrix,
and the chunk_text Python UDTF (Spark 4 UDTF surface)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_boundary_overlap_finds_seam(spark):
    from dlt_spark.dataops.contamination import boundary_overlap

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),     # tail: delta epsilon zeta
        (2, "delta epsilon zeta eta theta iota kappa"), # head: delta epsilon zeta
        (3, "one two three four five six"),
        (4, "short text"),                              # <= k tokens: excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in boundary_overlap(docs, k=3).collect()]
    assert got == [(1, 2, "delta epsilon zeta")]


def test_boundary_overlap_no_self_pairs(spark):
    from dlt_spark.dataops.contamination import boundary_overlap

    # a doc whose head equals its own tail must not pair with itself
    docs = spark.createDataFrame(
        [(1, "a b c x y a b c")], "doc_id long, text string"
    )
    assert boundary_overlap(docs, k=3).count() == 0


def test_zipf_slope_matches_numpy_fit(spark):
    import math

    from dlt_spark.dataops.text import zipf_slope

    # zipfian corpus: word i appears ~100/i times
    words = []
    for i in range(1, 21):
        words += [f"w{i:02d}"] * (100 // i)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    docs = docs.withColumn("source", F.lit("s"))
    row = zipf_slope(docs, "source", top_n=20).collect()[0]
    assert row["n_ranks"] == 20
    # replicate the quantized regression in python
    freqs = sorted(
        ((100 // i, f"w{i:02d}") for i in range(1, 21)),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [round(math.log(r + 1) * 1e6) for r in range(20)]
    ys = [round(math.log(f) * 1e6) for f, _ in freqs]
    n = 20
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert abs(row["slope"] - round(num / den, 9)) < 1e-9
    # and it's in zipf territory
    assert -1.3 < row["slope"] < -0.7


def test_confusion_matrix_counts_and_shares(spark):
    from dlt_spark.dataops.evalmetrics import confusion_matrix

    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")]
    df = spark.createDataFrame(rows, "actual string, predicted string")
    got = {
        (r["actual"], r["predicted"]): (r["n"], r["share"])
        for r in confusion_matrix(df, "actual", "predicted").collect()
    }
    assert got == {
        ("a", "a"): (2, round(2 / 3, 9)),
        ("a", "b"): (1, round(1 / 3, 9)),
        ("b", "b"): (1, 1.0),
    }


def test_chunk_text_udtf_rows_and_python_twin(spark):
    from dlt_spark.functions.udtf import chunk_text_rows, register_udtfs

    register_udtfs(spark)
    out = spark.sql(
        "SELECT * FROM chunk_text('A b c d e f g h i', 4, 2)"
    ).collect()
    got = [(r["chunk_idx"], r["n_tokens"], r["chunk"]) for r in out]
    assert got == list(chunk_text_rows("A b c d e f g h i", 4, 2))
    # windows step by size-overlap and the tail partial is kept
    assert got[0] == (0, 4, "a b c d")
    assert got[-1][2].endswith("i")
    # degenerate inputs
    assert list(chunk_text_rows(None, 4, 2)) == []
    assert list(chunk_text_rows("   ", 4, 2)) == []


def test_zipf_slope_single_rank_group_yields_null(spark):
    """A group with ONE distinct word has a zero regression denominator;
    under Spark 4 ANSI mode the naive division raises — the op must
    emit a NULL slope instead (oracle mirrors with CASE WHEN)."""
    from dlt_spark.dataops.text import zipf_slope

    docs = spark.createDataFrame(
        [(1, "same same same", "s1"), (2, "alpha beta beta", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in zipf_slope(docs, "source").collect()}
    assert rows["s1"]["n_ranks"] == 1 and rows["s1"]["slope"] is None
    assert rows["s2"]["n_ranks"] == 2 and rows["s2"]["slope"] is not None


def test_chunk_text_udtf_broken_eval_surfaces(spark):
    """A defective UDTF class must raise at registration/use, not fall
    back silently to pickled eval (the factory's fallback is reserved
    for the no-useArrow-parameter TypeError only)."""
    import pytest
    from pyspark.sql.functions import udtf

    class Broken:
        # wrong surface entirely: no eval method
        def evil(self, text):  # pragma: no cover - never called
            yield (0,)

    with pytest.raises(Exception) as ei:
        fn = udtf(Broken, returnType="chunk_idx int", useArrow=True)
        spark.udtf.register("broken_chunk", fn)
        spark.sql("SELECT * FROM broken_chunk('x')").collect()
    assert "eval" in str(ei.value).lower() or "Broken" in str(ei.value)


def test_chunk_text_udtf_factory_only_downgrades_on_typeerror():
    """make_chunk_text_udtf catches ONLY the no-useArrow TypeError; any
    other construction failure propagates."""
    from unittest import mock

    from dlt_spark.functions import udtf as udtf_mod

    calls = []

    def fake_udtf(cls, returnType=None, useArrow=None):
        calls.append(useArrow)
        if useArrow is not None:
            raise TypeError("udtf() got an unexpected keyword argument 'useArrow'")
        return "pickled-udtf"

    with mock.patch("pyspark.sql.functions.udtf", fake_udtf):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert udtf_mod.make_chunk_text_udtf() == "pickled-udtf"
        assert any("useArrow" in str(x.message) for x in w)
    assert calls == [True, None]

    def broken_udtf(cls, returnType=None, useArrow=None):
        raise RuntimeError("genuine failure")

    with mock.patch("pyspark.sql.functions.udtf", broken_udtf):
        import pytest

        with pytest.raises(RuntimeError, match="genuine failure"):
            udtf_mod.make_chunk_text_udtf()
