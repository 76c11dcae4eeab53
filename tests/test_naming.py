"""Naming convention tests — behavior parity with the reference
snake_case convention (tests/common/normalizers/test_naming_snake_case.py
is the model, SURVEY §5.1)."""

from dlt_spark.schema.naming import SnakeCaseNaming, shorten_identifier


def test_snake_case_basics():
    n = SnakeCaseNaming()
    assert n.normalize_identifier("CamelCase") == "camel_case"
    assert n.normalize_identifier("camelCaseKey") == "camel_case_key"
    assert n.normalize_identifier("simple") == "simple"
    assert n.normalize_identifier(" spaced ") == "spaced"


def test_snake_case_special_chars():
    n = SnakeCaseNaming()
    # reference snake_case: " Key!" -> "_key_" -> trailing _ becomes x
    assert n.normalize_identifier("CamelCase Key!") == "camel_case_keyx"
    assert n.normalize_identifier("a+b") == "axb"
    assert n.normalize_identifier("a-b") == "a_b"
    assert n.normalize_identifier("a@b") == "aab"
    assert n.normalize_identifier("a|b") == "alb"
    assert n.normalize_identifier("a*b") == "axb"


def test_snake_case_digits_and_underscores():
    n = SnakeCaseNaming()
    assert n.normalize_identifier("1col") == "_1col"
    assert n.normalize_identifier("col__x") == "col_x"
    assert n.normalize_identifier("trailing_") == "trailingx"
    assert n.normalize_identifier("trailing__") == "trailingxx"


def test_path_normalization_preserves_separator():
    n = SnakeCaseNaming()
    assert n.normalize_path("Parent__Child Field") == "parent__child_field"
    assert n.break_path("a__b__c") == ["a", "b", "c"]
    assert n.make_path("a", "b") == "a__b"


def test_shortening_deterministic_and_collision_safe():
    long_a = "a" * 100 + "_first"
    long_b = "a" * 100 + "_second"
    s_a = shorten_identifier(long_a, long_a, 30)
    s_b = shorten_identifier(long_b, long_b, 30)
    assert len(s_a) == 30 and len(s_b) == 30
    assert s_a != s_b
    assert s_a == shorten_identifier(long_a, long_a, 30)


def test_max_length_naming():
    n = SnakeCaseNaming(max_length=20)
    out = n.normalize_identifier("ThisIsAVeryLongIdentifierNameIndeed")
    assert len(out) == 20
