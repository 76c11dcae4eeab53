"""Property-based tests (hypothesis) for the schema core — beyond the
reference's test strategy (SURVEY §5 notes it has none)."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dlt_spark.schema.inference import CoercionError, coerce_value, infer_data_type
from dlt_spark.schema.naming import PATH_SEPARATOR, SnakeCaseNaming, shorten_identifier
from dlt_spark.schema.schema import Schema, version_hash
from dlt_spark.schema.typing import new_column, new_table

naming = SnakeCaseNaming()
ident_chars = string.ascii_letters + string.digits + " _-+*@|!.#"
idents = st.text(alphabet=ident_chars, min_size=1, max_size=40).filter(
    lambda s: s.strip()
)


@given(idents)
@settings(max_examples=200)
def test_snake_case_idempotent(s):
    once = naming.normalize_identifier(s)
    assert naming.normalize_identifier(once) == once


@given(idents)
@settings(max_examples=200)
def test_snake_case_output_is_safe(s):
    out = naming.normalize_identifier(s)
    assert out
    assert all(c.islower() or c.isdigit() or c == "_" or c == "x" for c in out)
    assert not out[0].isdigit()
    assert "__" not in out  # path separator never produced by a single ident


@given(idents, idents)
@settings(max_examples=100)
def test_path_roundtrip(a, b):
    path = naming.make_path(naming.normalize_identifier(a), naming.normalize_identifier(b))
    parts = naming.break_path(path)
    assert len(parts) == 2


@given(st.text(min_size=1, max_size=200), st.integers(min_value=12, max_value=60))
@settings(max_examples=200)
def test_shortening_respects_max_length(s, max_len):
    out = shorten_identifier(s, s, max_len)
    assert len(out) <= max(max_len, len(s) if len(s) <= max_len else max_len)


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=200)
def test_bigint_text_roundtrip(v):
    assert coerce_value("bigint", "text", str(v)) == v
    assert coerce_value("text", "bigint", v) == str(v)


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=100)
def test_binary_text_roundtrip(b):
    txt = coerce_value("text", "binary", b)
    assert coerce_value("binary", "text", txt) == b


@given(st.dictionaries(st.text(string.ascii_lowercase, min_size=1, max_size=8),
                       st.one_of(st.integers(), st.text(max_size=10), st.booleans()),
                       max_size=5))
@settings(max_examples=100)
def test_json_coercion_roundtrip(d):
    txt = coerce_value("text", "json", d)
    assert json.loads(txt) == d


@given(st.lists(st.tuples(st.text(string.ascii_lowercase, min_size=1, max_size=10),
                          st.sampled_from(["bigint", "text", "double", "bool"])),
                min_size=1, max_size=8, unique_by=lambda t: t[0]))
@settings(max_examples=100)
def test_version_hash_order_independent(cols):
    s1 = Schema("p")
    s1.update_table(new_table("t", columns=[new_column(n, d) for n, d in cols]))
    s2 = Schema("p")
    s2.update_table(new_table("t", columns=[new_column(n, d) for n, d in reversed(cols)]))
    # canonical JSON sorts keys -> same content hash regardless of
    # insertion order
    assert version_hash(s1.to_dict()) == version_hash(s2.to_dict())


@given(st.one_of(st.integers(), st.floats(allow_nan=False, allow_infinity=False),
                 st.text(max_size=20), st.booleans(), st.binary(max_size=20)))
@settings(max_examples=200)
def test_infer_never_crashes(v):
    t = infer_data_type(v)
    assert isinstance(t, str)


# --- round-7 surfaces -------------------------------------------------


@given(
    st.floats(min_value=0.05, max_value=0.95),
    st.sampled_from([16, 32, 64, 128, 256]),
)
@settings(max_examples=60, deadline=None)
def test_lsh_params_properties(threshold, num_perm):
    from dlt_spark.dataops.dedup import lsh_params

    b, r = lsh_params(threshold, num_perm)
    assert b * r == num_perm and b >= 1 and r >= 1
    # the 50%-candidacy point of the chosen s-curve brackets the target
    # loosely (within the coarse factorization grid of num_perm)
    t50 = (1.0 / b) ** (1.0 / r)
    assert 0.0 < t50 <= 1.0  # b=1 (one band) gives t50 == 1.0
    # monotone-ish: a much higher threshold never picks FEWER rows/band
    b2, r2 = lsh_params(min(threshold + 0.3, 0.97), num_perm)
    assert r2 >= r


def test_zorder_key_bounds_and_locality(spark):
    """The Morton key stays within bits*2 bits; sorting by it groups
    spatial neighbors (deterministic grid check)."""
    from pyspark.sql import functions as F

    from dlt_spark.store.zorder import zorder_key

    bits = 8
    points = [(float(x), float(y)) for x in range(16) for y in range(16)]
    ranges = {"x": (0.0, 15.0), "y": (0.0, 15.0)}
    df = spark.createDataFrame(points, "x double, y double")
    rows = df.select("x", "y", zorder_key(ranges, bits).alias("z")).collect()
    assert all(0 <= r["z"] < (1 << (2 * bits)) for r in rows)
    # monotone per axis when the other coordinate is fixed
    by_y0 = sorted((r["x"], r["z"]) for r in rows if r["y"] == 0.0)
    zs = [z for _, z in by_y0]
    assert zs == sorted(zs)


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1,
                max_size=32))
@settings(max_examples=60, deadline=None)
def test_canon_cell_int_float_distinct(vals):
    """The gate's canonical rendering never collapses an int cell and
    its float twin — the round-6 HUGEINT class stays visible."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    from verify_local import canon_cell

    for v in vals:
        assert canon_cell(v) != canon_cell(float(v))


@given(
    st.lists(
        st.lists(
            st.sampled_from("ab cd ef gh ij kl mn op".split()),
            min_size=1, max_size=12,
        ),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=30, deadline=None)
def test_boundary_overlap_matches_bruteforce(spark, corpora, k):
    """boundary_overlap == the quadratic python definition: doc_a's
    last k tokens equal doc_b's first k tokens, docs longer than k."""
    docs = [(i, " ".join(words)) for i, words in enumerate(corpora)]
    toks = {i: t.split() for i, t in docs}
    expect = sorted(
        (a, b, " ".join(toks[a][-k:]))
        for a in toks for b in toks
        if a != b and len(toks[a]) > k and len(toks[b]) > k
        and toks[a][-k:] == toks[b][:k]
    )
    from dlt_spark.dataops.contamination import boundary_overlap

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in boundary_overlap(sdf, k=k).collect())
    assert got == expect


@given(
    st.text(alphabet="abc ", min_size=0, max_size=60),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=100, deadline=None)
def test_chunk_text_rows_properties(text, size, overlap):
    """Pure-python chunker invariants: full token coverage in order,
    every chunk <= size tokens, consecutive chunks overlap by exactly
    `overlap` tokens except a clipped tail, indices dense from 0."""
    from dlt_spark.functions.udtf import chunk_text_rows

    overlap = min(overlap, size - 1) if size > 1 else 0
    toks = text.strip().lower().split()
    chunks = list(chunk_text_rows(text, size, overlap))
    if not toks:
        assert chunks == []
        return
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    for idx, n_tokens, chunk in chunks:
        assert len(chunk.split()) == n_tokens <= size
    # coverage: concatenating each chunk's non-overlapping suffix
    # reproduces the token stream exactly
    expect = []
    for idx, _, chunk in chunks:
        w = chunk.split()
        expect.extend(w[overlap:] if idx else w)
    assert expect == toks


_col_names = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)
_dtypes = st.sampled_from(["text", "bigint", "double", "bool", "complex"])


@given(
    st.dictionaries(  # engine-1 flat tables: name -> {col -> colschema}
        _col_names,
        st.dictionaries(
            _col_names,
            st.fixed_dictionaries(
                {"data_type": _dtypes, "nullable": st.booleans()}
            ),
            max_size=4,
        ),
        max_size=4,
    ),
    st.sampled_from([1, 2]),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_migration_ladder_fuzz_engine1_2(tables, engine, with_markers):
    """Random minimal engine-1/2 reference dicts (ADVICE r8 class: no
    marker keys at all) must either migrate cleanly through the ladder
    or raise — never silently ingest the flat tables dict as native
    table schemas.  Invariants after Schema.from_dict: every table has
    native shape ('columns' key), no 'complex' data_type survives
    (engine 10 renamed it json), engine tables exist."""
    import copy

    from dlt_spark.schema.migrations import looks_like_reference_schema
    from dlt_spark.schema.typing import LOADS_TABLE_NAME

    d = {"name": "fz", "engine_version": engine, "tables": copy.deepcopy(tables)}
    if with_markers:
        d["hints"] = {}
        d["preferred_types"] = {}
    if engine == 2:
        d["includes"] = []
        d["excludes"] = []
    if tables or with_markers or engine == 2:
        assert looks_like_reference_schema(d)
    dispatched = looks_like_reference_schema(d)
    s = Schema.from_dict(d)
    for t in s.tables.values():
        assert "columns" in t
        for c in t.get("columns", {}).values():
            assert c.get("data_type") != "complex"
    if dispatched:  # an EMPTY marker-less dict is legitimately ambiguous
        assert LOADS_TABLE_NAME in s.tables
    # and the migrated schema round-trips natively
    s2 = Schema.from_json(s.to_json())
    assert set(s2.tables) == set(s.tables)
