"""HTTP retry/backoff for the REST source.

Re-expression of the reference's retrying session
(``dlt/sources/helpers/requests/retry.py`` — whole file: status-code set
``DEFAULT_RETRY_STATUS = (429, 5xx)``, exception predicates, custom
condition hooks, exponential backoff capped at ``max_delay``, and
``Retry-After`` header support with both delta-seconds and HTTP-date
forms) for this engine's minimal session contract::

    session(method, url, headers, body) -> (status, headers, payload)

No external deps: the reference builds on requests+tenacity; here the
retry loop is ~60 lines of stdlib.  Sessions stay plain callables so the
fake transports used in tests compose unchanged.
"""

from __future__ import annotations

import random
import time
from email.utils import mktime_tz, parsedate_tz
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

TSession = Callable[[str, str, Dict[str, str], Optional[bytes]], Tuple[int, Dict[str, str], bytes]]
# predicate(status, headers, payload, exception) -> should_retry
TRetryCondition = Callable[[Optional[int], Optional[Dict[str, str]], Optional[bytes], Optional[BaseException]], bool]

DEFAULT_RETRY_STATUS = frozenset((429, *range(500, 600)))
DEFAULT_RETRY_EXCEPTIONS: Tuple[type, ...] = (OSError,)  # URLError/timeouts subclass OSError


def _parse_retry_after(value: str) -> Optional[float]:
    """Delta-seconds or HTTP-date (reference ``retry.py:82-96``)."""
    value = value.strip()
    if value.isdigit():
        return float(value)
    t = parsedate_tz(value)
    if t is None:
        return None
    return max(0.0, mktime_tz(t) - time.time())


def retrying_session(
    session: TSession,
    max_attempts: int = 5,
    backoff_factor: float = 1.0,
    max_delay: float = 60.0,
    retry_status: Sequence[int] = tuple(DEFAULT_RETRY_STATUS),
    retry_exceptions: Tuple[type, ...] = DEFAULT_RETRY_EXCEPTIONS,
    condition: Optional[TRetryCondition] = None,
    respect_retry_after: bool = True,
    sleep_fn: Callable[[float], None] = time.sleep,
    jitter: bool = True,
) -> TSession:
    """Wrap ``session`` with retry-on-status / retry-on-exception and
    exponential backoff.  The wrapped callable preserves the session
    contract, so it drops into ``RESTClient`` (and the fake transports in
    tests) unchanged.

    - transient statuses (429/5xx by default) and transport exceptions
      (``OSError`` family) retry up to ``max_attempts``;
    - a ``Retry-After`` response header overrides the computed backoff
      (clamped to ``max_delay``);
    - ``condition`` adds a custom predicate over (status, headers,
      payload, exception) — the reference's ``retry_condition`` hook;
    - after the budget is spent the last response is returned (or the
      last exception re-raised) so callers keep their own error handling.
    """
    status_set = set(retry_status)

    def call(method: str, url: str, headers: Dict[str, str], body: Optional[bytes]):
        last_exc: Optional[BaseException] = None
        for attempt in range(max_attempts):
            status: Optional[int] = None
            rheaders: Optional[Dict[str, str]] = None
            payload: Optional[bytes] = None
            last_exc = None
            try:
                status, rheaders, payload = session(method, url, headers, body)
            except retry_exceptions as ex:  # type: ignore[misc]
                last_exc = ex
            should = (
                last_exc is not None
                or status in status_set
                or (condition is not None and condition(status, rheaders, payload, last_exc))
            )
            if not should:
                return status, rheaders, payload
            if attempt == max_attempts - 1:
                break
            delay = min(max_delay, backoff_factor * (2 ** attempt))
            if respect_retry_after and rheaders:
                ra = next(
                    (v for k, v in rheaders.items() if k.lower() == "retry-after"), None
                )
                if ra is not None:
                    parsed = _parse_retry_after(str(ra))
                    if parsed is not None:
                        delay = min(max_delay, parsed)
            if jitter:
                delay *= 0.5 + random.random() / 2
            sleep_fn(delay)
        if last_exc is not None:
            raise last_exc
        return status, rheaders, payload  # type: ignore[return-value]

    return call
