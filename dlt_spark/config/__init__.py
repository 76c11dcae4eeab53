"""Config & secrets resolution: ``dlt.config`` / ``dlt.secrets`` analog.

Re-expression of the reference's provider system
(``dlt/common/configuration/providers/environ.py`` — the ``SECTION__KEY``
uppercase env convention; ``providers/toml.py`` — ``.dlt/secrets.toml`` /
``.dlt/config.toml`` with a project-dir + global-dir merge;
``resolve.py`` — most-specific-first section fallback) reduced to what an
engine needs: deterministic key lookup across ordered providers, not a
dependency-injection framework.

Lookup precedence (reference ``ConfigProvidersContext`` order):

1. environment variables — key ``A__B__KEY`` (sections joined by ``__``,
   uppercased);
2. ``secrets.toml`` — settings dir (``.dlt/`` by default, overridable via
   ``DLT_SPARK_SETTINGS_DIR``) merged over the global dir (``~/.dlt``);
3. ``config.toml`` — same resolution.

Section fallback mirrors the reference: for key ``k`` under sections
``(a, b)`` the probe order is ``a.b.k``, ``a.k``, ``k`` — a source-scoped
credential (``sources.my_api.api_key``) falls back to the shared one
(``sources.api_key``) and finally the bare key.

Secrets hygiene: values resolved under a key marked secret must come from
a secret-capable provider (env or secrets.toml) — finding one in
``config.toml`` raises, same as the reference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

try:  # py311+ stdlib
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None  # type: ignore


class ConfigKeyNotFound(KeyError):
    def __init__(self, key: str, traces: List[str]) -> None:
        self.key = key
        self.traces = traces
        super().__init__(
            f"config value {key!r} not found; looked in: " + "; ".join(traces)
        )


class SecretInPlainConfig(Exception):
    """A secret-marked key was found in a provider that must not hold
    secrets (``config.toml``)."""


class ConfigProvider:
    name: str = "base"
    supports_secrets: bool = False

    def get_value(self, key: str, *sections: str) -> Tuple[Optional[Any], str]:
        """Return (value, probed-location) — value None when absent."""
        raise NotImplementedError


class EnvironProvider(ConfigProvider):
    """``sources.my_api.api_key`` -> ``SOURCES__MY_API__API_KEY``
    (reference ``providers/environ.py:14-17``)."""

    name = "environ"
    supports_secrets = True

    @staticmethod
    def key_name(key: str, *sections: str) -> str:
        return "__".join([*sections, key]).upper()

    def get_value(self, key: str, *sections: str) -> Tuple[Optional[Any], str]:
        k = self.key_name(key, *sections)
        return os.environ.get(k), f"env:{k}"


class DictProvider(ConfigProvider):
    """In-memory provider over a nested dict — the unit-test double and
    the base for the toml providers."""

    name = "dict"

    def __init__(self, doc: Optional[Dict[str, Any]] = None) -> None:
        self._doc: Dict[str, Any] = doc or {}

    def get_value(self, key: str, *sections: str) -> Tuple[Optional[Any], str]:
        node: Any = self._doc
        path = [*sections, *key.split(".")]
        for part in path:
            if not isinstance(node, dict) or part not in node:
                return None, f"{self.name}:{'.'.join(path)}"
            node = node[part]
        return node, f"{self.name}:{'.'.join(path)}"

    @property
    def is_empty(self) -> bool:
        return not self._doc


def _merge_nested(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_nested(out[k], v)
        else:
            out[k] = v
    return out


class TomlProvider(DictProvider):
    """``.dlt/<file>.toml`` merged over ``~/.dlt/<file>.toml`` (settings
    dir wins — reference ``providers/toml.py`` SettingsTomlProvider)."""

    def __init__(
        self,
        file_name: str,
        supports_secrets: bool,
        settings_dir: Optional[str] = None,
        global_dir: Optional[str] = None,
    ) -> None:
        self.name = file_name
        self.supports_secrets = supports_secrets
        settings_dir = settings_dir or os.environ.get(
            "DLT_SPARK_SETTINGS_DIR", os.path.join(os.getcwd(), ".dlt")
        )
        global_dir = global_dir or os.path.join(os.path.expanduser("~"), ".dlt")
        doc: Dict[str, Any] = {}
        for d in (global_dir, settings_dir):  # settings overrides global
            p = os.path.join(d, file_name)
            if tomllib is not None and os.path.isfile(p):
                with open(p, "rb") as f:
                    doc = _merge_nested(doc, tomllib.load(f))
        super().__init__(doc)


def _coerce(value: Any, expected_type: Optional[type]) -> Any:
    """Env values arrive as strings; coerce them the way the reference's
    deserialization does: exact type when requested, else bool/int/float/
    JSON literals, else the raw string."""
    if value is None or expected_type is str:
        return value
    if isinstance(value, str):
        s = value.strip()
        if expected_type is bool:
            return s.lower() in ("1", "true", "yes", "on")
        if expected_type in (int, float):
            return expected_type(s)
        if expected_type in (dict, list) or (
            expected_type is None and s[:1] in ("{", "[")
        ):
            try:
                return json.loads(s)
            except json.JSONDecodeError:
                if expected_type is not None:
                    raise
                return value
        if expected_type is None:
            low = s.lower()
            if low in ("true", "false"):
                return low == "true"
            try:
                return int(s)
            except ValueError:
                try:
                    return float(s)
                except ValueError:
                    return value
    elif expected_type is not None and not isinstance(value, expected_type):
        return expected_type(value)
    return value


class _Accessor:
    """``dlt.config`` / ``dlt.secrets`` — dotted-key access over the
    provider chain with section fallback."""

    def __init__(self, secret: bool, providers: Optional[List[ConfigProvider]] = None) -> None:
        self._secret = secret
        self._providers = providers

    # providers are resolved lazily so env/cwd changes (tests!) take effect
    def providers(self) -> List[ConfigProvider]:
        if self._providers is not None:
            return self._providers
        chain: List[ConfigProvider] = [EnvironProvider()]
        chain.append(TomlProvider("secrets.toml", supports_secrets=True))
        if not self._secret:
            chain.append(TomlProvider("config.toml", supports_secrets=False))
        return chain

    @staticmethod
    def _section_chains(sections: Sequence[str]) -> List[Tuple[str, ...]]:
        # (a, b) -> [(a, b), (a,), ()]  — most specific first
        out = [tuple(sections)]
        while out[-1]:
            out.append(out[-1][:-1])
        return out

    def get(
        self,
        key: str,
        default: Any = None,
        expected_type: Optional[type] = None,
        sections: Sequence[str] = (),
    ) -> Any:
        traces: List[str] = []
        # a dotted key carries its own sections: "sources.api.key"
        parts = key.split(".")
        base_key, own_sections = parts[-1], tuple(parts[:-1])
        all_sections = (*tuple(sections), *own_sections)
        for provider in self.providers():
            for chain in self._section_chains(all_sections):
                v, where = provider.get_value(base_key, *chain)
                traces.append(where)
                if v is not None:
                    if self._secret and not provider.supports_secrets:
                        raise SecretInPlainConfig(
                            f"secret {key!r} found in non-secret provider"
                            f" {provider.name!r} ({where}); move it to"
                            " secrets.toml or the environment"
                        )
                    return _coerce(v, expected_type)
        if default is not _RAISE:
            return default
        raise ConfigKeyNotFound(key, traces)

    def __getitem__(self, key: str) -> Any:
        return self.get(key, default=_RAISE)

    def __contains__(self, key: str) -> bool:
        return self.get(key, default=None) is not None


class _Raise:
    pass


_RAISE = _Raise()

config = _Accessor(secret=False)
secrets = _Accessor(secret=True)


def resolve_credentials(
    explicit: Any = None,
    sections: Sequence[str] = (),
    keys: Sequence[str] = ("credentials",),
) -> Any:
    """Source-helper: return ``explicit`` when given, else probe
    ``secrets`` under ``sections`` for the first present key.  Sources
    call this so ``sql_database()`` / ``rest_api()`` work with zero
    inline credentials when ``.dlt/secrets.toml`` or env vars are set."""
    if explicit is not None:
        return explicit
    for k in keys:
        v = secrets.get(k, sections=sections)
        if v is not None:
            return v
    return None
