"""Identifier naming conventions.

Re-expression of the reference's pluggable naming layer
(``dlt/common/normalizers/naming/snake_case.py:40-75`` and
``naming.py:94-135`` in dlt-hub/dlt) as pure-Python utilities applied to
Spark DataFrame column / table names.  There is no Catalyst concept for
identifier normalization, so this stays driver-side string code; it is
O(#columns), never O(#rows), and therefore scale-free.

Observable behavior matched to the reference ``snake_case`` convention:

- trims whitespace around the identifier
- ``+`` and ``*`` -> ``x``, ``-`` -> ``_``, ``@`` -> ``a``, ``|`` -> ``l``
- any other non-alphanumeric ascii -> ``_``
- camelCase breaks -> ``_`` and lower-cases everything
- a leading digit gets a ``_`` prefix
- trailing ``_`` runs are replaced with the same number of ``x``
- runs of ``_`` collapse to a single ``_`` (protects the ``__`` path
  separator used between parent/child path segments)
- identifiers longer than ``max_length`` are trimmed around a deterministic
  base64(shake_128) tag so collisions stay improbable
"""

from __future__ import annotations

import base64
import hashlib
import math
import re
from functools import lru_cache

PATH_SEPARATOR = "__"

_RE_UNDERSCORES = re.compile(r"__+")
_RE_LEADING_DIGITS = re.compile(r"^\d+")
_RE_NON_ALPHANUMERIC = re.compile(r"[^a-zA-Z\d_]+")
_RE_BREAK_1 = re.compile(r"([^_])([A-Z][a-z]+)")
_RE_BREAK_2 = re.compile(r"([a-z0-9])([A-Z])")
_TR_REDUCE = str.maketrans("+-*@|", "x_xal")
_TR_B64_SAFE = bytes.maketrans(b"+/", b"ab")

DEFAULT_COLLISION_PROB = 0.001


class SnakeCaseNaming:
    """Case-insensitive snake_case naming convention (the engine default)."""

    def __init__(self, max_length: int = 0) -> None:
        # 0 = unlimited; Spark itself has no identifier cap, but destinations
        # (HMS: 767, some catalogs: 255) do, so the knob is kept.
        self.max_length = max_length

    @property
    def is_case_sensitive(self) -> bool:
        return False

    def normalize_identifier(self, identifier: str) -> str:
        if identifier is None:
            raise ValueError("identifier must not be None")
        identifier = identifier.strip()
        if not identifier:
            raise ValueError("identifier must not be empty")
        return _normalize_snake(identifier, self.max_length)

    def normalize_path(self, path: str) -> str:
        """Normalize each ``__``-separated segment, then shorten the whole."""
        segments = [
            _normalize_snake(p, 0) for p in path.split(PATH_SEPARATOR) if p.strip()
        ]
        return shorten_identifier(PATH_SEPARATOR.join(segments), path, self.max_length)

    def make_path(self, *identifiers: str) -> str:
        return PATH_SEPARATOR.join(i for i in identifiers if i)

    def break_path(self, path: str) -> list[str]:
        return [p for p in path.split(PATH_SEPARATOR) if p]

    def normalize_table_identifier(self, identifier: str) -> str:
        return self.normalize_identifier(identifier)

    def shorten_fragments(self, *identifiers: str) -> str:
        return shorten_identifier(
            self.make_path(*identifiers), self.make_path(*identifiers), self.max_length
        )


class DuckCaseNaming(SnakeCaseNaming):
    """Reference ``duck_case``: case-sensitive, keeps emoji/unicode,
    only collapses whitespace/separators to ``_``."""

    @property
    def is_case_sensitive(self) -> bool:
        return True

    def normalize_identifier(self, identifier: str) -> str:
        if identifier is None or not identifier.strip():
            raise ValueError("identifier must not be empty")
        ident = re.sub(r"[\s/\\.]+", "_", identifier.strip())
        ident = _RE_UNDERSCORES.sub("_", ident)
        return shorten_identifier(ident, identifier, self.max_length)

    def normalize_path(self, path: str) -> str:
        segments = [
            self.normalize_identifier(p) for p in path.split(PATH_SEPARATOR) if p.strip()
        ]
        return shorten_identifier(PATH_SEPARATOR.join(segments), path, self.max_length)


class SqlCsNaming(SnakeCaseNaming):
    """Reference ``sql_cs_v1``: case-sensitive SQL-safe identifiers —
    non-alphanumerics to ``_``, leading digit prefixed, case preserved."""

    @property
    def is_case_sensitive(self) -> bool:
        return True

    def normalize_identifier(self, identifier: str) -> str:
        if identifier is None or not identifier.strip():
            raise ValueError("identifier must not be empty")
        ident = _RE_NON_ALPHANUMERIC.sub("_", identifier.strip())
        if _RE_LEADING_DIGITS.match(ident):
            ident = "_" + ident
        ident = _RE_UNDERSCORES.sub("_", ident)
        return shorten_identifier(ident, identifier, self.max_length)

    def normalize_path(self, path: str) -> str:
        segments = [
            self.normalize_identifier(p) for p in path.split(PATH_SEPARATOR) if p.strip()
        ]
        return shorten_identifier(PATH_SEPARATOR.join(segments), path, self.max_length)


class SqlCiNaming(SqlCsNaming):
    """Reference ``sql_ci_v1``: like sql_cs but lower-cased."""

    @property
    def is_case_sensitive(self) -> bool:
        return False

    def normalize_identifier(self, identifier: str) -> str:
        return super().normalize_identifier(identifier).lower()


class DirectNaming:
    """Pass-through convention (reference ``naming/direct.py``): keeps
    identifiers as-is apart from length shortening."""

    def __init__(self, max_length: int = 0) -> None:
        self.max_length = max_length

    @property
    def is_case_sensitive(self) -> bool:
        return True

    def normalize_identifier(self, identifier: str) -> str:
        return shorten_identifier(identifier.strip(), identifier, self.max_length)

    def normalize_path(self, path: str) -> str:
        return shorten_identifier(path.strip(), path, self.max_length)

    def make_path(self, *identifiers: str) -> str:
        return PATH_SEPARATOR.join(i for i in identifiers if i)

    def break_path(self, path: str) -> list[str]:
        return [p for p in path.split(PATH_SEPARATOR) if p]

    normalize_table_identifier = normalize_identifier


class S3TablesNaming(SnakeCaseNaming):
    """Reference ``s3_tables`` (``naming/s3_tables.py``): snake_case with
    a 255-char cap (AWS S3 Tables rule) and leading underscores removed
    from TABLE identifiers (column identifiers keep them)."""

    MAX_IDENTIFIER_LENGTH = 255

    def __init__(self, max_length: int = 0) -> None:
        if max_length and max_length > self.MAX_IDENTIFIER_LENGTH:
            raise ValueError(
                "max_length for s3_tables naming may not exceed"
                f" {self.MAX_IDENTIFIER_LENGTH}"
            )
        super().__init__(max_length or self.MAX_IDENTIFIER_LENGTH)

    def normalize_table_identifier(self, identifier: str) -> str:
        norm = self.normalize_identifier(identifier)
        return re.sub(r"^_+", "", norm) or norm


NAMING_CONVENTIONS = {
    "snake_case": SnakeCaseNaming,
    "duck_case": DuckCaseNaming,
    "direct": DirectNaming,
    "sql_cs_v1": SqlCsNaming,
    "sql_ci_v1": SqlCiNaming,
    "s3_tables": S3TablesNaming,
}


def naming_from_name(name: str, max_length: int = 0):
    """Pluggable convention lookup (reference naming module registry)."""
    try:
        return NAMING_CONVENTIONS[name](max_length)
    except KeyError:
        raise ValueError(
            f"unknown naming convention {name!r}; choose from {sorted(NAMING_CONVENTIONS)}"
        ) from None


@lru_cache(maxsize=None)
def _normalize_snake(identifier: str, max_length: int) -> str:
    norm = identifier.translate(_TR_REDUCE)
    norm = _RE_NON_ALPHANUMERIC.sub("_", norm)
    norm = _RE_BREAK_1.sub(r"\1_\2", norm)
    norm = _RE_BREAK_2.sub(r"\1_\2", norm).lower()
    if _RE_LEADING_DIGITS.match(norm):
        norm = "_" + norm
    stripped = norm.rstrip("_")
    norm = stripped + "x" * (len(norm) - len(stripped))
    norm = _RE_UNDERSCORES.sub("_", norm)
    return shorten_identifier(norm, identifier, max_length)


@lru_cache(maxsize=None)
def shorten_identifier(
    normalized: str,
    original: str,
    max_length: int,
    collision_prob: float = DEFAULT_COLLISION_PROB,
) -> str:
    """Trim `normalized` to `max_length`, splicing in a deterministic tag
    computed from the *original* identifier so distinct long names stay
    distinct (reference ``naming.py:94-135``)."""
    if not max_length or len(normalized) <= max_length:
        return normalized
    tag_len = int(((2 + 1) * math.log2(1 / collision_prob) // 8) + 1)
    tag = (
        base64.b64encode(hashlib.shake_128(original.encode("utf-8")).digest(tag_len))
        .rstrip(b"=")
        .translate(_TR_B64_SAFE)
        .lower()
        .decode("ascii")
    )
    remaining = max_length - len(tag)
    head = remaining // 2 + remaining % 2
    tail = remaining // 2
    out = normalized[:head] + tag + (normalized[len(normalized) - tail :] if tail else "")
    assert len(out) == max_length
    return out
