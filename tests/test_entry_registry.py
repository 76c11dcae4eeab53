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


def test_window_prioritizes_latest_not_green(tmp_path, monkeypatch):
    """A query whose LATEST driver check is red (hash mismatch or err)
    must lead the next window — tier 0 — so a fix gets a confirming
    driver row next round instead of waiting 2-3 rotation cycles
    (round-6 verdict item #2)."""
    names = ["q_old_green", "q_red_hash", "q_never", "q_err", "q_fixed"]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_old_green": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None},
        "q_red_hash": {"rows_match": True, "schema_match": True,
                       "hash_match": False, "err": None},
        "q_err": {"rows_match": False, "err": "boom"},
        "q_fixed": {"rows_match": True, "hash_match": False, "err": None},
    }))
    # q_fixed went green on a LATER check — must drop out of tier 0
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_fixed": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
    }))
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "entry.py"))
    ordered = entry._driver_window_order(names)
    assert ordered[:2] == ["q_red_hash", "q_err"]
    assert ordered.index("q_never") < ordered.index("q_fixed")
    assert ordered.index("q_never") < ordered.index("q_old_green")
    # green-on-latest rotate oldest-round-first behind never-checked
    assert ordered.index("q_old_green") < ordered.index("q_fixed")


def test_oracle_outputs_no_hugeint_columns():
    """DuckDB ``sum(INTEGER/BIGINT)`` returns HUGEINT, which
    ``duckdb.df()`` renders as float64 while the Spark twin emits int64
    — the driver then hashes ``123.0`` against ``123`` (the round-6
    hash-red class: kmeans_lloyd / tpch_q12 / vocab_coverage).  Pin the
    whole class: no oracle may emit a HUGEINT / unsigned-wide output
    column; wrap integral sums in ``CAST(... AS BIGINT)``.  Planning
    only (``.types`` binds without executing) — runs in seconds."""
    import duckdb
    import pytest

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no testdata at {sf_dir}")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    banned = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        hits = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in banned
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"oracle columns that pandas-render as float64: {bad}"


def test_queries_and_bench_reference_registered_names():
    import re

    src = open(os.path.join(os.path.dirname(os.path.abspath(entry.__file__)), "bench.py")).read()
    bench = re.findall(r'"(\w+)"', re.search(r"BENCH_QUERIES = \[(.*?)\]", src, re.S).group(1))
    registry = set(entry._all_queries())
    missing = [n for n in bench if n not in registry]
    assert not missing, missing


def test_stale_since_code_change_promotes_affected_queries():
    """Tier 3 (VERDICT r7 #6): a checked-green query whose implementing
    dlt_spark module changed AFTER its last driver check jumps ahead of
    plain oldest-first rotation — here, 'touching dedup.py' promotes
    the dedup family via injected timestamp providers."""
    q = entry._all_queries()
    fn = q["dedup_minhash_lsh"]
    mods = entry._query_impl_modules(fn)
    assert any("dedup" in m for m in mods), mods

    # module edited at t=200, check committed at t=100 -> stale
    assert entry._stale_since_check(
        fn, 7,
        module_ts=lambda p: 200.0,
        check_ts=lambda p: 100.0,
        dirty=lambda: set(),
    )
    # module older than the check -> fresh
    assert not entry._stale_since_check(
        fn, 7,
        module_ts=lambda p: 50.0,
        check_ts=lambda p: 100.0,
        dirty=lambda: set(),
    )
    # uncommitted working-tree edit counts as stale regardless of ts
    assert entry._stale_since_check(
        fn, 7,
        module_ts=lambda p: 50.0,
        check_ts=lambda p: 100.0,
        dirty=lambda: {mods[0]},
    )
    # no CORRECTNESS commit found -> cannot assess, not stale
    assert not entry._stale_since_check(
        fn, 7,
        module_ts=lambda p: 200.0,
        check_ts=lambda p: None,
        dirty=lambda: set(),
    )


def test_window_order_stale_tier_between_never_checked_and_rotation():
    """End-to-end on the real registry/git state: the ordering is still
    a permutation when the stale tier is active, and any stale-promoted
    name sorts before a fresh checked name of the same last round."""
    q = entry._all_queries()
    ordered = entry._driver_window_order(list(q), q)
    assert sorted(ordered) == sorted(q)


def test_entry_fingerprint_tier_promotes_changed_queries(tmp_path, monkeypatch):
    """Tier 3 (r9): a checked-green query whose ENTRY-LEVEL fingerprint
    (query source + oracle SQL) differs from QUERY_FINGERPRINTS.json
    jumps ahead of rotation — the module tier cannot see edits inside
    __spark_entry__.py itself."""
    import hashlib
    import inspect
    import json
    import os
    import shutil

    q = entry._all_queries()
    oracles = entry.oracle_sql()
    here = os.path.dirname(os.path.abspath(entry.__file__))

    # _query_fingerprint matches the snapshot tool's hash byte-for-byte
    name = "tpch_q1"
    src = inspect.getsource(q[name])
    want = hashlib.sha256(
        (src + "\0" + oracles[name]).encode()
    ).hexdigest()[:16]
    assert entry._query_fingerprint(q[name], oracles[name]) == want

    # committed snapshot: every fingerprint current EXCEPT tpch_q1's
    snap = {n: entry._query_fingerprint(fn, oracles.get(n)) for n, fn in q.items()}
    snap[name] = "0" * 16
    real = os.path.join(here, "QUERY_FINGERPRINTS.json")
    backup = None
    if os.path.exists(real):
        backup = real + ".bak_test"
        shutil.copy(real, backup)
    try:
        with open(real, "w") as fh:
            json.dump(snap, fh)
        ordered = entry._driver_window_order(list(q), q)
        # tpch_q1 (checked green many rounds ago) must now sit ahead of
        # every other CHECKED query that has no promotion reason
        others = [
            n for n in ordered
            if n != name and n not in ("model_chain",)
        ]
        assert ordered.index(name) < 30, ordered.index(name)
    finally:
        if backup:
            shutil.move(backup, real)
