"""Deterministic in-process REST transport for tests and demos.

Serves a synthetic paged API with no network: 230 users at 25/page
(``/users?page=N``, page-number style with ``total_pages`` in the body)
and the same rows offset-style (``/items?offset=N&limit=M`` with
``total``).  Lives inside the package so Spark's Python executors can
import it by path (``transport="dlt_spark.sources.demo_transport:
make_session"``) — the executor-side analog of the fake transports the
rest_api tests inject driver-side.
"""

from __future__ import annotations

import json
import urllib.parse

TOTAL = 230
PAGE_SIZE = 25


# mutable feed for the streaming reader demo/tests: grows page by page
# (append-only page space — cursor-API semantics).  The stream reader
# runs in Spark's Python planner worker — a separate process — so the
# feed size lives in a file both processes can see, not a module global.
FEED_FILE = "/tmp/dlt_demo_feed_total.txt"


def set_feed_total(n: int) -> None:
    with open(FEED_FILE, "w") as f:
        f.write(str(n))


def _feed_total() -> int:
    try:
        with open(FEED_FILE) as f:
            return int(f.read().strip() or 0)
    except OSError:
        return 0


def make_session():
    def session(method, url, headers, body):
        parsed = urllib.parse.urlparse(url)
        qs = dict(urllib.parse.parse_qsl(parsed.query))
        if parsed.path.endswith("/users"):
            page = int(qs.get("page", 1))
            total_pages = (TOTAL + PAGE_SIZE - 1) // PAGE_SIZE
            lo = (page - 1) * PAGE_SIZE
            hi = min(lo + PAGE_SIZE, TOTAL)
            users = [
                {"id": i, "name": f"user_{i}", "page": page} for i in range(lo, hi)
            ]
            payload = {"users": users, "total_pages": total_pages}
            return 200, {}, json.dumps(payload).encode()
        if parsed.path.endswith("/feed"):
            page = int(qs.get("page", 1))
            lo = (page - 1) * PAGE_SIZE
            hi = min(lo + PAGE_SIZE, _feed_total())
            events = [{"id": i, "kind": f"k{i % 3}"} for i in range(lo, hi)]
            return 200, {}, json.dumps({"events": events}).encode()
        if parsed.path.endswith("/changes"):
            # incremental change feed: 230 rows, coarse cursor ts = id//10
            # (0..22), val deterministic; `since` filters server-side the
            # way a real API binds an incremental start param
            since = int(qs.get("since", 0))
            page = int(qs.get("page", 1))
            rows = [
                {"id": i, "ts": i // 10, "val": (i * 37) % 100}
                for i in range(TOTAL)
                if i // 10 >= since
            ]
            lo = (page - 1) * PAGE_SIZE
            out = rows[lo : lo + PAGE_SIZE]
            return 200, {}, json.dumps({"changes": out}).encode()
        if parsed.path.endswith("/items"):
            offset = int(qs.get("offset", 0))
            limit = int(qs.get("limit", 10))
            lo, hi = offset, min(offset + limit, TOTAL)
            payload = {"items": [{"id": i} for i in range(lo, hi)], "total": TOTAL}
            return 200, {}, json.dumps(payload).encode()
        return 404, {}, b"{}"

    return session
