"""Retry/backoff tests (reference tests/sources/helpers/test_requests.py
shapes: fail-then-succeed, status sets, Retry-After, custom condition)."""

import json

import pytest

from dlt_spark.sources.retry import retrying_session


def _mk_session(script):
    """script: list of either Exception instances or (status, headers,
    payload) tuples, consumed one per call; last entry repeats."""
    calls = []

    def session(method, url, headers, body):
        i = min(len(calls), len(script) - 1)
        calls.append((method, url))
        item = script[i]
        if isinstance(item, BaseException):
            raise item
        return item

    session.calls = calls
    return session


def test_fails_twice_then_succeeds():
    inner = _mk_session([
        (503, {}, b""),
        OSError("conn reset"),
        (200, {}, b'{"ok": true}'),
    ])
    sess = retrying_session(inner, sleep_fn=lambda s: None)
    status, headers, payload = sess("GET", "http://x/y", {}, None)
    assert status == 200
    assert json.loads(payload)["ok"] is True
    assert len(inner.calls) == 3


def test_exhausted_returns_last_response():
    inner = _mk_session([(500, {}, b"boom")])
    sess = retrying_session(inner, max_attempts=3, sleep_fn=lambda s: None)
    status, _, payload = sess("GET", "http://x", {}, None)
    assert status == 500 and payload == b"boom"
    assert len(inner.calls) == 3


def test_exhausted_reraises_exception():
    inner = _mk_session([OSError("down")])
    sess = retrying_session(inner, max_attempts=2, sleep_fn=lambda s: None)
    with pytest.raises(OSError, match="down"):
        sess("GET", "http://x", {}, None)
    assert len(inner.calls) == 2


def test_non_retry_status_passes_through():
    inner = _mk_session([(404, {}, b"nope")])
    sess = retrying_session(inner, sleep_fn=lambda s: None)
    status, _, _ = sess("GET", "http://x", {}, None)
    assert status == 404
    assert len(inner.calls) == 1


def test_retry_after_header_honored():
    sleeps = []
    inner = _mk_session([
        (429, {"Retry-After": "7"}, b""),
        (200, {}, b"ok"),
    ])
    sess = retrying_session(
        inner, sleep_fn=sleeps.append, jitter=False, backoff_factor=1.0
    )
    status, _, _ = sess("GET", "http://x", {}, None)
    assert status == 200
    assert sleeps == [7.0]  # header overrides the 1s backoff


def test_exponential_backoff_capped():
    sleeps = []
    inner = _mk_session([(500, {}, b"")])
    sess = retrying_session(
        inner, max_attempts=5, backoff_factor=1.0, max_delay=3.0,
        sleep_fn=sleeps.append, jitter=False,
    )
    sess("GET", "http://x", {}, None)
    assert sleeps == [1.0, 2.0, 3.0, 3.0]  # 1,2,4->3,8->3


def test_custom_condition():
    # API that returns 200 with an error body — reference's
    # retry_condition predicate hook
    inner = _mk_session([
        (200, {}, b'{"error": "try again"}'),
        (200, {}, b'{"data": 1}'),
    ])
    sess = retrying_session(
        inner,
        condition=lambda st, hd, payload, exc: payload is not None and b"error" in payload,
        sleep_fn=lambda s: None,
    )
    _, _, payload = sess("GET", "http://x", {}, None)
    assert b"data" in payload
    assert len(inner.calls) == 2


def test_rest_client_retries_by_default():
    from dlt_spark.sources.rest_api import RESTClient

    inner = _mk_session([
        (503, {}, b""),
        (200, {}, b'[{"id": 1}]'),
    ])
    # patch sleep via retry config
    client = RESTClient("http://api", session=inner, retry={"sleep_fn": lambda s: None})
    pages = list(client.paginate("items"))
    assert pages == [[{"id": 1}]]
    assert len(inner.calls) == 2
