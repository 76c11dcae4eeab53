"""Distributed REST ingestion via Spark 4's Python Data Source API.

The driver-side :mod:`dlt_spark.sources.rest_api` client mirrors the
reference's sequential fetch loop (rest_api source,
``dlt/sources/rest_api/__init__.py:63``) — fine for config-driven
parent-child resolution, but single-machine.  This module is the *scale
path*: a ``spark.read.format("dlt_rest")`` source whose page ranges are
fetched BY EXECUTORS in parallel.

Works because this repo's page/offset paginators are stateless (the
cursor rides in the request params), so partition *k* can start at page
``start + k*pages_per_partition`` with no shared state.  Link/cursor
paginators are inherently sequential and fall back to one partition.

Options (all strings, per the DataSource option map):

- ``base_url``, ``path``        — endpoint
- ``schema_ddl``                — result schema, e.g. ``"id long, name string"``
- ``params``                    — base query params, JSON object
- ``paginator``                 — JSON: ``{"type": "page_number"|"offset"|
  "single_page", ...paginator kwargs..., "total_pages": N}``.
  ``total_pages`` (or probing, below) bounds the page space so it can be
  split; without it the source reads sequentially in one partition.
- ``probe_total``               — "true": fetch page 1 on the driver at
  planning time and read the paginator's ``total_path`` to learn the
  page count (one request, standard DSv2 planning cost)
- ``pages_per_partition``       — chunk size (default 8)
- ``data_selector``             — JSONPath into the response
- ``transport``                 — ``module:attr`` import path of a
  zero-arg factory returning a session callable
  ``(method, url, headers, body) -> (status, headers, payload)``;
  resolved on each executor (factories must be importable there).
  Default: stdlib urllib HTTPS session.
- ``headers``                   — JSON object of extra headers
- ``max_pages``                 — overall safety cap (default 10000)

Auth note: executors need credentials; pass static header auth via
``headers`` (resolved from dlt_spark config/secrets on the driver) or
bake token refresh into a custom ``transport`` factory.
"""

from __future__ import annotations

import importlib
import json as _json
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _resolve_factory(path: str):
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


def _make_paginator(cfg: dict, start_override: Optional[int] = None):
    from . import rest_api as ra

    kind = cfg.get("type", "single_page")
    kwargs = {k: v for k, v in cfg.items() if k not in ("type", "total_pages")}
    if kind == "page_number":
        if start_override is not None:
            kwargs["start"] = start_override
        return ra.PageNumberPaginator(**kwargs)
    if kind == "offset":
        pag = ra.OffsetPaginator(**kwargs)
        if start_override is not None:
            # stateless: shift the first request's offset to the range start
            base_first = pag.first

            def first(url, params, _base=base_first, _off=start_override):
                u, p = _base(url, params)
                p[pag.offset_param] = _off * pag.limit
                return u, p

            pag.first = first  # type: ignore[method-assign]
        return pag
    if kind == "single_page":
        return ra.SinglePagePaginator()
    raise ValueError(
        f"paginator type {kind!r} is not partitionable; use the driver-side "
        "rest_api source for link/cursor pagination"
    )


class PageRange(InputPartition):
    def __init__(self, start_page: int, num_pages: int):
        self.start_page = start_page
        self.num_pages = num_pages


class RestReader(DataSourceReader):
    def __init__(self, schema, options: dict):
        self.schema = schema
        self.base_url = options["base_url"]
        self.path = options.get("path", "")
        self.params = _json.loads(options.get("params", "{}"))
        self.paginator_cfg = _json.loads(options.get("paginator", '{"type": "single_page"}'))
        self.data_selector = options.get("data_selector")
        self.transport = options.get("transport")
        self.headers = _json.loads(options.get("headers", "{}"))
        self.pages_per_partition = int(options.get("pages_per_partition", "8"))
        self.max_pages = int(options.get("max_pages", "10000"))
        self.probe_total = options.get("probe_total", "false").lower() == "true"
        self.fields = [f.name for f in schema.fields]

    # ---- planning (driver)

    def _client(self):
        from . import rest_api as ra

        session = _resolve_factory(self.transport)() if self.transport else None
        return ra.RESTClient(self.base_url, headers=self.headers, session=session,
                             retry={"max_attempts": 3})

    def _total_pages(self) -> Optional[int]:
        cfg = self.paginator_cfg
        if "total_pages" in cfg:
            return int(cfg["total_pages"])
        if not self.probe_total:
            return None
        kind = cfg.get("type")
        total_path = cfg.get("total_path")
        if kind not in ("page_number", "offset") or not total_path:
            return None
        # one planning-time request to learn the extent of the page space
        from . import rest_api as ra

        client = self._client()
        pag = _make_paginator(cfg)
        url = f"{self.base_url}/{self.path.lstrip('/')}"
        u, p = pag.first(url, dict(self.params))
        import urllib.parse

        full = u + ("?" + urllib.parse.urlencode(p) if p else "")
        status, _, payload = client.session("GET", full, dict(self.headers), None)
        if status >= 400:
            raise RuntimeError(f"planning probe GET {full} -> {status}")
        body = _json.loads(payload) if payload else {}
        total = ra._jsonpath(body, total_path)
        if total is None:
            return None
        if kind == "offset":
            limit = int(cfg.get("limit", 1))
            return (int(total) + limit - 1) // limit
        return int(total)

    def partitions(self) -> List[PageRange]:
        total = self._total_pages()
        if total is None or self.paginator_cfg.get("type") == "single_page":
            return [PageRange(0, min(self.max_pages, 1 if self.paginator_cfg.get("type") == "single_page" else self.max_pages))]
        total = min(total, self.max_pages)
        chunk = self.pages_per_partition
        return [
            PageRange(start, min(chunk, total - start))
            for start in range(0, total, chunk)
        ]

    # ---- execution (executors)

    def read(self, partition: PageRange) -> Iterator[tuple]:
        cfg = self.paginator_cfg
        kind = cfg.get("type", "single_page")
        start = None
        if kind == "page_number":
            start = int(cfg.get("start", 1)) + partition.start_page
        elif kind == "offset":
            start = partition.start_page
        pag = _make_paginator(cfg, start_override=start)
        client = self._client()
        for items in client.paginate(
            self.path,
            params=dict(self.params),
            paginator=pag,
            data_selector=self.data_selector,
            max_pages=partition.num_pages,
        ):
            for item in items:
                yield tuple(item.get(f) for f in self.fields)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch REST polling: dlt's incremental-cursor model mapped
    onto Structured Streaming offsets.

    The offset is ``{"page": N, "row": R}`` — the next page to poll and
    how many of its rows were already emitted.  With ``page_size`` set,
    the reader only advances PAST pages that returned exactly
    ``page_size`` items; a partially-filled tail page is emitted from
    ``row`` onward and re-polled next batch, so items that later fill it
    up are picked up exactly once (a feed whose total is not
    page-aligned would otherwise lose them).  Without ``page_size`` the
    reader falls back to advancing past any non-empty page, which is
    only exactly-once for page spaces that grow in whole pages.  Replays
    (``readBetweenOffsets``) re-fetch the exact page/row range, giving
    the deterministic re-read Structured Streaming needs for
    exactly-once sinks.  Page-number pagination only; runs on the driver
    (a poll loop, not a scan — the heavy backfill path is the batch
    reader).
    """

    def __init__(self, schema, options: dict):
        self.schema = schema
        self.base_url = options["base_url"]
        self.path = options.get("path", "")
        self.params = _json.loads(options.get("params", "{}"))
        self.paginator_cfg = _json.loads(options.get("paginator", '{"type": "page_number"}'))
        if self.paginator_cfg.get("type") != "page_number":
            raise ValueError("streaming REST source supports page_number pagination")
        self.data_selector = options.get("data_selector")
        self.transport = options.get("transport")
        self.headers = _json.loads(options.get("headers", "{}"))
        self.pages_per_batch = int(options.get("pages_per_batch", "10"))
        ps = options.get("page_size")
        self.page_size = int(ps) if ps is not None else None
        self.start_page = int(self.paginator_cfg.get("start", 1))
        self.fields = [f.name for f in schema.fields]

    def _client(self):
        from . import rest_api as ra

        session = _resolve_factory(self.transport)() if self.transport else None
        return ra.RESTClient(self.base_url, headers=self.headers, session=session,
                             retry={"max_attempts": 3})

    def initialOffset(self) -> dict:
        return {"page": self.start_page, "row": 0}

    def _fetch_page_lists(self, first_page: int, max_pages: int):
        """Raw item lists per page, stopping at the first empty page."""
        pag = _make_paginator(self.paginator_cfg, start_override=first_page)
        pages: List[list] = []
        for items in self._client().paginate(
            self.path,
            params=dict(self.params),
            paginator=pag,
            data_selector=self.data_selector,
            max_pages=max_pages,
        ):
            if not items:
                break
            pages.append(items)
        return pages

    def _to_rows(self, items: list) -> list:
        return [tuple(item.get(f) for f in self.fields) for item in items]

    def read(self, start: dict):
        page = int(start["page"])
        skip = int(start.get("row", 0))
        pages = self._fetch_page_lists(page, self.pages_per_batch)
        rows: list = []
        cur = page
        for i, items in enumerate(pages):
            first_skip = skip if i == 0 else 0
            if self.page_size is not None and len(items) < self.page_size:
                # partial tail page: emit the unseen rows but do NOT
                # advance past it — later-arriving items that fill the
                # page are picked up next batch (exactly-once for
                # non-page-aligned growth)
                rows.extend(self._to_rows(items[first_skip:]))
                return iter(rows), {"page": cur, "row": len(items)}
            rows.extend(self._to_rows(items[first_skip:]))
            cur += 1
        return iter(rows), {"page": cur, "row": 0}

    def readBetweenOffsets(self, start: dict, end: dict):
        page = int(start["page"])
        skip = int(start.get("row", 0))
        end_page = int(end["page"])
        end_row = int(end.get("row", 0))
        n = end_page - page + (1 if end_row > 0 else 0)
        if n <= 0:
            return iter([])
        pages = self._fetch_page_lists(page, n)
        rows: list = []
        for i, items in enumerate(pages):
            first_skip = skip if i == 0 else 0
            if page + i == end_page:
                items = items[:end_row]
            rows.extend(self._to_rows(items[first_skip:]))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class RestDataSource(DataSource):
    """``spark.read.format("dlt_rest")`` (batch, partitioned) and
    ``spark.readStream.format("dlt_rest")`` (incremental page polling) —
    register with ``spark.dataSource.register(RestDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "dlt_rest"

    def schema(self):
        return self.options["schema_ddl"]

    def reader(self, schema) -> RestReader:
        return RestReader(schema, dict(self.options))

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(schema, dict(self.options))
