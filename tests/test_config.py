"""Config/secrets provider tests — behavior modeled on the reference's
tests/common/configuration/test_configuration.py and test_toml_provider.py
(env-var naming, provider precedence, section fallback, secret hygiene)."""

import os

import pytest

from dlt_spark.config import (
    ConfigKeyNotFound,
    DictProvider,
    EnvironProvider,
    SecretInPlainConfig,
    TomlProvider,
    _Accessor,
)


@pytest.fixture()
def settings_dir(tmp_path, monkeypatch):
    d = tmp_path / ".dlt"
    d.mkdir()
    monkeypatch.setenv("DLT_SPARK_SETTINGS_DIR", str(d))
    return d


def _write(d, name, text):
    (d / name).write_text(text)


def test_environ_key_naming():
    assert (
        EnvironProvider.key_name("api_key", "sources", "my_api")
        == "SOURCES__MY_API__API_KEY"
    )


def test_env_lookup(monkeypatch):
    monkeypatch.setenv("SOURCES__MY_API__API_KEY", "k-123")
    acc = _Accessor(secret=True)
    assert acc.get("api_key", sections=("sources", "my_api")) == "k-123"
    # dotted-key form carries its own sections
    assert acc["sources.my_api.api_key"] == "k-123"


def test_section_fallback(monkeypatch):
    # specific absent -> falls back to the shared key, then bare
    monkeypatch.setenv("SOURCES__API_KEY", "shared")
    acc = _Accessor(secret=True)
    assert acc.get("api_key", sections=("sources", "my_api")) == "shared"
    monkeypatch.setenv("SOURCES__MY_API__API_KEY", "specific")
    assert acc.get("api_key", sections=("sources", "my_api")) == "specific"


def test_toml_secrets_and_precedence(settings_dir, monkeypatch):
    _write(
        settings_dir,
        "secrets.toml",
        '[sources.my_api]\napi_key = "from-toml"\n',
    )
    acc = _Accessor(secret=True)
    assert acc["sources.my_api.api_key"] == "from-toml"
    # env wins over toml (provider order)
    monkeypatch.setenv("SOURCES__MY_API__API_KEY", "from-env")
    assert acc["sources.my_api.api_key"] == "from-env"


def test_toml_global_dir_merge(tmp_path, settings_dir):
    glob = tmp_path / "home_dlt"
    glob.mkdir()
    _write(glob, "config.toml", 'a = "global"\nb = "global"\n')
    _write(settings_dir, "config.toml", 'a = "local"\n')
    p = TomlProvider(
        "config.toml", supports_secrets=False,
        settings_dir=str(settings_dir), global_dir=str(glob),
    )
    assert p.get_value("a")[0] == "local"  # settings dir wins
    assert p.get_value("b")[0] == "global"  # global fills the gaps


def test_secret_in_plain_config_raises(settings_dir):
    _write(settings_dir, "config.toml", '[sources.my_api]\npassword = "oops"\n')
    acc = _Accessor(secret=False)
    assert acc["sources.my_api.password"] == "oops"  # config access is fine
    sec = _Accessor(
        secret=True,
        providers=[
            TomlProvider("config.toml", supports_secrets=False,
                         settings_dir=str(settings_dir), global_dir="/nonexistent")
        ],
    )
    with pytest.raises(SecretInPlainConfig):
        sec["sources.my_api.password"]


def test_missing_key_raises_with_trace():
    acc = _Accessor(secret=False, providers=[DictProvider({})])
    with pytest.raises(ConfigKeyNotFound) as ei:
        acc["nope.missing"]
    assert "nope" in str(ei.value)
    assert acc.get("nope.missing", default=42) == 42


def test_env_value_coercion(monkeypatch):
    monkeypatch.setenv("N_WORKERS", "8")
    monkeypatch.setenv("RATIO", "0.25")
    monkeypatch.setenv("FLAG", "true")
    monkeypatch.setenv("OPTS", '{"a": 1}')
    acc = _Accessor(secret=False)
    assert acc["n_workers"] == 8
    assert acc["ratio"] == 0.25
    assert acc["flag"] is True
    assert acc["opts"] == {"a": 1}
    assert acc.get("n_workers", expected_type=str) == "8"


def test_sql_table_resolves_connection_from_env(monkeypatch, spark):
    from dlt_spark.sources.sql_database import sql_table

    # no URL given and nothing configured -> helpful error
    monkeypatch.delenv("SOURCES__SQL_DATABASE__CREDENTIALS", raising=False)
    with pytest.raises(ValueError, match="sql_database.credentials"):
        sql_table(spark, table="t")
    # configured -> picked up (fails later at JDBC connect, which proves
    # the URL reached the reader)
    monkeypatch.setenv(
        "SOURCES__SQL_DATABASE__CREDENTIALS", "jdbc:h2:mem:testdb"
    )
    with pytest.raises(Exception) as ei:
        sql_table(spark, table="t").count()
    assert "h2" in str(ei.value).lower() or "driver" in str(ei.value).lower()


def test_rest_auth_resolves_secret_fields(settings_dir):
    from dlt_spark.sources.rest_api import _build_auth

    _write(
        settings_dir,
        "secrets.toml",
        '[sources.github.auth]\ntoken = "ghp_secret"\n',
    )
    auth = _build_auth({"type": "bearer"}, "github", None)
    assert auth.headers() == {"Authorization": "Bearer ghp_secret"}


def test_pipeline_settings_from_config(settings_dir, spark, tmp_path):
    import dlt_spark

    _write(
        settings_dir,
        "config.toml",
        f'[pipelines.cfg_pipe]\ndestination = "{tmp_path}/dest"\n'
        'dataset_name = "cfg_ds"\n',
    )
    pipe = dlt_spark.pipeline("cfg_pipe", spark=spark)
    assert pipe.dataset_name == "cfg_ds"
    assert str(tmp_path) in pipe.store.root
