"""Meta-invariants of the driver-facing entry module: every registered
query has a DuckDB oracle, the self-rotating verification window is a
permutation of the registry, and the judge-backlog tier fills the
window until the driver has covered it."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def test_every_query_has_an_oracle():
    q, o = set(entry._all_queries()), set(entry.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_window_order_is_a_permutation():
    names = list(entry._all_queries())
    ordered = entry._driver_window_order(names)
    assert sorted(ordered) == sorted(names)
    assert len(ordered) == len(set(ordered))


def test_window_prioritizes_unchecked_backlog():
    """Names never seen in any CORRECTNESS file must fill the window
    before already-green entries; checked entries rotate oldest-first."""
    names = list(entry._all_queries())
    ordered = entry._driver_window_order(names)
    checked = set()
    here = os.path.dirname(os.path.abspath(entry.__file__))
    import glob

    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            checked |= set(json.load(open(p)))
        except Exception:
            continue
    if not checked or len(names) - len(checked & set(names)) < 50:
        return  # not enough unchecked entries to fill a window
    first50 = ordered[:50]
    assert all(n not in checked for n in first50), [
        n for n in first50 if n in checked
    ]


def test_no_complex_typed_outputs(spark):
    """The driver's canonicalizer (pandas sort_values -> factorize)
    crashes on list/dict cells, so EVERY registered query must emit
    scalar-only output columns.  Lazy ``.schema`` inspection at
    sf0.001 — no execution for plan-only queries (pipeline queries run
    their small E2E load, which is what they do anyway).

    This pins the round-5 regression class: pool_embeddings and
    random_projection shipped ARRAY<double> outputs that were green in
    tools/verify_local.py (its canon_cell stringified lists) but err'd
    at the driver."""
    from pyspark.sql import types as T

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip(f"no testdata at {sf_dir}")
    bad = {}
    for name, fn in entry._all_queries().items():
        df = fn(spark, sf_dir)
        complex_fields = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_fields:
            bad[name] = complex_fields
    assert not bad, f"complex-typed output columns (driver-incompatible): {bad}"


def test_queries_and_bench_reference_registered_names():
    import re

    src = open(os.path.join(os.path.dirname(os.path.abspath(entry.__file__)), "bench.py")).read()
    bench = re.findall(r'"(\w+)"', re.search(r"BENCH_QUERIES = \[(.*?)\]", src, re.S).group(1))
    registry = set(entry._all_queries())
    missing = [n for n in bench if n not in registry]
    assert not missing, missing
