"""Declarative REST API source — driver-side fetch, Spark-side data plane.

Re-expression of the reference rest_api source
(``dlt/sources/rest_api/__init__.py:63-78``, config schema
``typing.py:256-322``, paginators
``dlt/sources/helpers/rest_client/paginators.py``, auth
``rest_api/typing.py:145-199``).  API pagination is inherently sequential
per endpoint, so the HTTP loop stays on the driver (exactly like the
reference); every page lands in the engine as rows for one
``spark.createDataFrame``-backed resource, and everything downstream
(normalize/merge/incremental) is distributed.

The HTTP transport is injectable (``session=``) so tests run against a
fake; the default uses ``urllib`` from the standard library (no external
deps in this container).
"""

from __future__ import annotations

import json as _json
import urllib.parse
import urllib.request
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

from ..incremental import Incremental
from ..pipeline.resources import DltResource, DltSource

# ----------------------------------------------------------------- auth


class BearerTokenAuth:
    """``Authorization: Bearer <token>`` (reference typing.py:152)."""

    def __init__(self, token: str) -> None:
        self.token = token

    def headers(self) -> Dict[str, str]:
        return {"Authorization": f"Bearer {self.token}"}


class APIKeyAuth:
    """Key in header or query (reference typing.py:160)."""

    def __init__(self, name: str, api_key: str, location: str = "header") -> None:
        self.name, self.api_key, self.location = name, api_key, location

    def headers(self) -> Dict[str, str]:
        return {self.name: self.api_key} if self.location == "header" else {}

    def params(self) -> Dict[str, str]:
        return {self.name: self.api_key} if self.location == "query" else {}


class HttpBasicAuth:
    def __init__(self, username: str, password: str) -> None:
        import base64

        creds = base64.b64encode(f"{username}:{password}".encode()).decode()
        self._header = {"Authorization": f"Basic {creds}"}

    def headers(self) -> Dict[str, str]:
        return dict(self._header)


class OAuth2ClientCredentials:
    """Client-credentials flow: fetch/refresh an access token from the
    token endpoint, then behave like bearer auth (reference
    typing.py:176-199)."""

    def __init__(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        session: Optional[Callable] = None,
    ) -> None:
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self._session = session or _default_session
        self._token: Optional[str] = None

    def headers(self) -> Dict[str, str]:
        if self._token is None:
            body = urllib.parse.urlencode(
                {
                    "grant_type": "client_credentials",
                    "client_id": self.client_id,
                    "client_secret": self.client_secret,
                }
            ).encode()
            status, _, payload = self._session(
                "POST", self.token_url, {"Content-Type": "application/x-www-form-urlencoded"}, body
            )
            if status != 200:
                raise RuntimeError(f"token endpoint returned {status}")
            self._token = _json.loads(payload)["access_token"]
        return {"Authorization": f"Bearer {self._token}"}


# ------------------------------------------------------------ paginators


class SinglePagePaginator:
    """One request, no pagination (reference paginators.py:75)."""

    def first(self, url: str, params: Dict[str, Any]) -> tuple:
        return url, params

    def next(self, url, params, response, items) -> Optional[tuple]:
        return None


class PageNumberPaginator:
    """?page=N until short/empty page or total reached
    (reference paginators.py:265).  Stateless: the current page rides in
    the request params, so one paginator instance can drive many
    independent paginations (parent-child resolve re-fetches)."""

    def __init__(self, page_param: str = "page", start: int = 1, total_path: Optional[str] = None, stop_after_empty: bool = True) -> None:
        self.page_param, self.start = page_param, start
        self.total_path = total_path
        self.stop_after_empty = stop_after_empty

    def first(self, url, params):
        return url, {**params, self.page_param: self.start}

    def next(self, url, params, response, items):
        if self.stop_after_empty and not items:
            return None
        page = int(params.get(self.page_param, self.start))
        if self.total_path:
            total = _jsonpath(response, self.total_path)
            if total is not None and page >= int(total):
                return None
        return url, {**params, self.page_param: page + 1}


class OffsetPaginator:
    """?offset=N&limit=M (reference paginators.py:416).  Stateless, see
    PageNumberPaginator."""

    def __init__(self, limit: int, offset_param: str = "offset", limit_param: str = "limit", total_path: Optional[str] = None) -> None:
        self.limit = limit
        self.offset_param, self.limit_param = offset_param, limit_param
        self.total_path = total_path

    def first(self, url, params):
        return url, {**params, self.offset_param: 0, self.limit_param: self.limit}

    def next(self, url, params, response, items):
        if len(items) < self.limit:
            return None
        offset = int(params.get(self.offset_param, 0)) + self.limit
        if self.total_path:
            total = _jsonpath(response, self.total_path)
            if total is not None and offset >= int(total):
                return None
        return url, {**params, self.offset_param: offset, self.limit_param: self.limit}


class HeaderLinkPaginator:
    """RFC5988 ``Link: <url>; rel="next"`` (reference paginators.py:665)."""

    def __init__(self, links_next_key: str = "next") -> None:
        self.key = links_next_key

    def first(self, url, params):
        return url, params

    def next(self, url, params, response, items):
        link = (response.get("__headers__") or {}).get("Link", "")
        for part in link.split(","):
            if f'rel="{self.key}"' in part:
                nxt = part.split(";")[0].strip().strip("<>")
                return nxt, {}
        return None


class JSONLinkPaginator:
    """Next-page URL inside the body, e.g. ``{"next": "..."}``
    (reference paginators.py:717)."""

    def __init__(self, next_url_path: str = "next") -> None:
        self.path = next_url_path

    def first(self, url, params):
        return url, params

    def next(self, url, params, response, items):
        nxt = _jsonpath(response, self.path)
        return (nxt, {}) if nxt else None


class JSONResponseCursorPaginator:
    """Cursor in body -> request param (reference paginators.py:787)."""

    def __init__(self, cursor_path: str = "cursor", cursor_param: str = "cursor") -> None:
        self.cursor_path, self.cursor_param = cursor_path, cursor_param

    def first(self, url, params):
        return url, params

    def next(self, url, params, response, items):
        cur = _jsonpath(response, self.cursor_path)
        if not cur:
            return None
        return url, {**params, self.cursor_param: cur}


class HeaderCursorPaginator:
    """Cursor in a response header -> request param
    (reference paginators.py:942)."""

    def __init__(self, cursor_key: str = "next_cursor", cursor_param: str = "cursor") -> None:
        self.cursor_key, self.cursor_param = cursor_key, cursor_param

    def first(self, url, params):
        return url, params

    def next(self, url, params, response, items):
        cur = (response.get("__headers__") or {}).get(self.cursor_key)
        if not cur:
            return None
        return url, {**params, self.cursor_param: cur}


# ------------------------------------------------------------- client


def _default_session(method: str, url: str, headers: Dict[str, str], body: Optional[bytes]) -> tuple:
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 (user-supplied URL by design)
        return resp.status, dict(resp.headers), resp.read()


def _jsonpath(obj: Any, path: str) -> Any:
    """Dotted-path access ('data.items' / '$.data.items'); [] segments for
    lists (subset of the reference's JSONPath, dlt/common/jsonpath.py)."""
    if obj is None:
        return None
    cur = obj
    for seg in path.lstrip("$").strip(".").split("."):
        if not seg:
            continue
        if isinstance(cur, dict):
            cur = cur.get(seg)
        else:
            return None
    return cur


class _Response:
    """Minimal response object passed to response-action hooks (shape of
    ``requests.Response`` as used by the reference hooks: status_code,
    headers, text/content/json, mutable ``_content``)."""

    def __init__(self, status_code: int, headers: Dict[str, str], content: bytes) -> None:
        self.status_code = status_code
        self.headers = headers
        self._content = content or b""

    @property
    def content(self) -> bytes:
        return self._content

    @property
    def text(self) -> str:
        return self._content.decode("utf-8", errors="replace")

    def json(self) -> Any:
        return _json.loads(self._content) if self._content else None


def _apply_response_actions(resp: _Response, actions: List[Any]) -> Optional[str]:
    """Evaluate actions in order (reference ``_handle_response_action``,
    ``config_setup.py:566``): first matching "ignore" wins; matching
    callables run (and may mutate the response) without stopping the
    scan."""
    for action in actions:
        if callable(action):
            action(resp)
            continue
        status_code = action.get("status_code")
        content_substr = action.get("content")
        act = action.get("action")
        matched = True
        if status_code is not None and resp.status_code != status_code:
            matched = False
        if matched and content_substr is not None and content_substr not in resp.text:
            matched = False
        if not matched:
            continue
        if act == "ignore":
            return "ignore"
        hooks = act if isinstance(act, list) else [act]
        for hook in hooks:
            if not callable(hook):
                raise TypeError(
                    "response_actions action must be 'ignore', a callable,"
                    f" or a list of callables; got {act!r}"
                )
            hook(resp)
    return None


class RESTClient:
    def __init__(
        self,
        base_url: str,
        auth: Optional[object] = None,
        headers: Optional[Dict[str, str]] = None,
        session: Optional[Callable] = None,
        retry: Optional[Dict[str, Any]] = None,
    ) -> None:
        """``retry``: kwargs for :func:`dlt_spark.sources.retry.
        retrying_session` (max_attempts, backoff_factor, ...), ``{}`` for
        defaults, or ``{"max_attempts": 1}`` to disable.  Retrying is ON
        by default like the reference's requests wrapper — the first
        flaky 503 must not kill a pipeline run."""
        from .retry import retrying_session

        self.base_url = base_url.rstrip("/")
        self.auth = auth
        self.headers = headers or {}
        self.session = retrying_session(session or _default_session, **(retry or {}))

    def paginate(
        self,
        path: str,
        params: Optional[Dict[str, Any]] = None,
        paginator: Optional[object] = None,
        data_selector: Optional[str] = None,
        max_pages: int = 10_000,
        response_actions: Optional[List[Any]] = None,
    ) -> Iterator[List[dict]]:
        """``response_actions`` (reference ``rest_api/typing.py:264`` +
        ``config_setup.py:566-672``): a list of per-response hooks applied
        before the default raise-on-4xx.  Each action is either a callable
        ``hook(response)`` (may mutate ``response._content``) or a dict
        ``{status_code?, content?, action}`` where ``action`` is
        ``"ignore"`` (end pagination quietly — e.g. 404-as-empty), a
        callable, or a list of callables.  Unhandled error statuses still
        raise (reference fallback ``raise_for_status``)."""
        paginator = paginator or SinglePagePaginator()
        url = f"{self.base_url}/{path.lstrip('/')}" if not path.startswith("http") else path
        params = dict(params or {})
        nxt = paginator.first(url, params)
        pages = 0
        while nxt is not None and pages < max_pages:
            u, p = nxt
            headers = dict(self.headers)
            if self.auth is not None:
                headers.update(self.auth.headers())
                if hasattr(self.auth, "params"):
                    p = {**p, **self.auth.params()}
            full = u + ("?" + urllib.parse.urlencode(p) if p else "")
            status, resp_headers, payload = self.session("GET", full, headers, None)
            if response_actions:
                resp = _Response(status, resp_headers, payload)
                verdict = _apply_response_actions(resp, response_actions)
                if verdict == "ignore":
                    return  # treated as end-of-data (404-as-empty etc.)
                payload = resp.content
                status = resp.status_code  # hooks may overwrite it
            if status >= 400:
                raise RuntimeError(f"GET {full} -> {status}")
            body = _json.loads(payload) if payload else {}
            if isinstance(body, dict):
                body["__headers__"] = resp_headers
            items = (
                _jsonpath(body, data_selector)
                if data_selector
                else (body if isinstance(body, list) else _auto_select(body))
            )
            items = items or []
            yield items
            pages += 1
            nxt = paginator.next(u, p, body if isinstance(body, dict) else {}, items)


def _auto_select(body: dict) -> List[dict]:
    """Reference data_selector auto-detection: first list-valued key."""
    for k, v in body.items():
        if isinstance(v, list):
            return v
    return [body] if body else []


# ------------------------------------- declarative endpoint incremental


def _setup_incremental(endpoint: Dict[str, Any]) -> tuple:
    """Declarative incremental config -> ``(Incremental | None,
    start_param, end_param, convert)`` — reference
    ``rest_api/config_setup.py:214-277`` (``setup_incremental_object``)
    and ``typing.py:209-233``.

    Two spellings, same as the reference:

    - a request param valued ``{"type": "incremental", "cursor_path":
      ..., "initial_value": ...}`` (or a ready ``Incremental`` instance)
      — the param name becomes the start param; ``end_value``/
      ``end_param`` are rejected there (use the endpoint form);
    - an endpoint-level ``incremental`` dict with ``start_param`` /
      optional ``end_param`` plus any ``Incremental`` kwargs.

    ``convert`` (deprecated alias ``transform``) maps the cursor value
    to the wire format before it is bound into the request.
    """
    params = endpoint.get("params") or {}
    inc_params = [
        k
        for k, v in params.items()
        if isinstance(v, Incremental)
        or (isinstance(v, dict) and v.get("type") == "incremental")
    ]
    if len(inc_params) > 1:
        raise ValueError(
            "Only a single incremental parameter is allowed per endpoint."
            f" Found parameters: {inc_params}"
        )
    for pname, pcfg in params.items():
        if isinstance(pcfg, Incremental):
            if pcfg.end_value is not None:
                raise ValueError(
                    f"Only `initial_value` is allowed in the configuration of"
                    f" param: {pname!r}. To set `end_value` too use the"
                    " incremental configuration at the endpoint level."
                )
            return pcfg, pname, None, None
        if isinstance(pcfg, dict) and pcfg.get("type") == "incremental":
            if pcfg.get("end_value") or pcfg.get("end_param"):
                raise ValueError(
                    f"Only `start_param` and `initial_value` are allowed in the"
                    f" configuration of param: {pname!r}. To set `end_value`"
                    " too use the incremental configuration at the endpoint"
                    " level."
                )
            convert = pcfg.get("convert") or pcfg.get("transform")
            cfg = {
                k: v
                for k, v in pcfg.items()
                if k not in ("type", "convert", "transform")
            }
            return Incremental(**cfg), pname, None, convert
    inc_cfg = endpoint.get("incremental")
    if inc_cfg:
        if isinstance(inc_cfg, Incremental):
            raise TypeError(
                "endpoint-level `incremental` must be a config dict with"
                " `start_param` (an Incremental instance carries no request"
                " param name); pass the instance as a param value instead"
            )
        convert = inc_cfg.get("convert") or inc_cfg.get("transform")
        cfg = {
            k: v
            for k, v in inc_cfg.items()
            if k not in ("start_param", "end_param", "convert", "transform")
        }
        return (
            Incremental(**cfg),
            inc_cfg.get("start_param"),
            inc_cfg.get("end_param"),
            convert,
        )
    return None, None, None, None


def _wire_value(v: Any, convert: Optional[Callable[[Any], Any]]) -> Any:
    """Cursor value -> request-param value: user ``convert`` wins;
    datetimes/dates default to ISO-8601 text."""
    import datetime as _dt

    if convert is not None:
        return convert(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def _bind_incremental_params(
    static: Dict[str, Any],
    inc: Incremental,
    start_param: Optional[str],
    end_param: Optional[str],
    convert: Optional[Callable[[Any], Any]],
) -> Dict[str, Any]:
    """Inject the CURRENT cursor window into the request params
    (reference ``_set_incremental_params``, config_setup.py:1005-1021).
    Called at fetch time, after the pipeline restored persisted state,
    so the second run requests only data past the stored cursor."""
    out = dict(static)
    if start_param and inc.last_value is not None:
        out[start_param] = _wire_value(inc.last_value, convert)
    if end_param and inc.end_value is not None:
        out[end_param] = _wire_value(inc.end_value, convert)
    return out


def _expand_incremental_placeholders(value: Any, inc: Optional[Incremental], convert=None) -> Any:
    """``{incremental.start_value}`` / ``{incremental.last_value}`` /
    ``{incremental.end_value}`` / ``{incremental.initial_value}``
    placeholders in paths and string params (reference
    ``paginate_resource`` format_kwargs, config_setup.py:1108-1126)."""
    if inc is None or not isinstance(value, str) or "{incremental." not in value:
        return value
    subs = {
        "{incremental.start_value}": inc.last_value,
        "{incremental.last_value}": inc.last_value,
        "{incremental.end_value}": inc.end_value,
        "{incremental.initial_value}": inc.initial_value,
    }
    for ph, v in subs.items():
        if ph in value:
            if v is None:
                # never interpolate the literal text 'None' into a
                # URL/param — the placeholder references a cursor value
                # that is unset (e.g. {incremental.end_value} with no
                # end_value configured)
                raise ValueError(
                    f"Incremental placeholder {ph!r} references an unset"
                    " cursor value; configure the corresponding"
                    " initial_value/end_value or drop the placeholder"
                )
            value = value.replace(ph, str(_wire_value(v, convert)))
    return value


# ------------------------------------------------------------- source


_AUTH_TYPES = {
    "bearer": (lambda c, s: BearerTokenAuth(c["token"]), ("token",)),
    "api_key": (
        lambda c, s: APIKeyAuth(c.get("name", "api-key"), c["api_key"], c.get("location", "header")),
        ("api_key",),
    ),
    "http_basic": (
        lambda c, s: HttpBasicAuth(c["username"], c["password"]),
        ("username", "password"),
    ),
    "oauth2_client_credentials": (
        lambda c, s: OAuth2ClientCredentials(
            c["token_url"], c["client_id"], c["client_secret"], session=s
        ),
        ("client_id", "client_secret"),
    ),
}


def _build_auth(auth_cfg: Any, source_name: str, session: Optional[Callable]) -> Optional[object]:
    """Declarative auth config -> auth object (reference
    ``rest_api/config_setup.py`` AUTH_MAP).  Accepts a ready auth object
    unchanged.  Secret fields missing from the dict resolve from
    ``sources.<name>.auth.<field>`` (env
    ``SOURCES__<NAME>__AUTH__<FIELD>`` or ``.dlt/secrets.toml``) — the
    reference's injected-secret workflow."""
    if auth_cfg is None or not isinstance(auth_cfg, dict):
        return auth_cfg
    from ..config import secrets as _secrets

    cfg = dict(auth_cfg)
    atype = cfg.pop("type", "bearer")
    if atype not in _AUTH_TYPES:
        raise ValueError(f"unknown auth type {atype!r}")
    build, secret_fields = _AUTH_TYPES[atype]
    for fld in secret_fields:
        if fld not in cfg:
            v = _secrets.get(fld, sections=("sources", source_name, "auth"))
            if v is not None:
                cfg[fld] = v
    return build(cfg, session)


def rest_api_source(
    config: Dict[str, Any],
    name: str = "rest_api",
    session: Optional[Callable] = None,
) -> DltSource:
    """Declarative config -> DltSource (reference
    ``rest_api/__init__.py:63-78``).  Supported keys:

    ``client``: {base_url, auth?, headers?, paginator?}
    ``resources``: list of {name, endpoint: {path, params?, data_selector?,
    paginator?}, primary_key?, write_disposition?}; a param value
    ``{"type": "resolve", "resource": r, "field": f}`` creates a
    parent-child dependency resolved per parent item (reference
    ``typing.py:256-322`` resolve semantics).
    """
    client_cfg = config["client"]
    client = RESTClient(
        client_cfg["base_url"],
        auth=_build_auth(client_cfg.get("auth"), name, session),
        headers=client_cfg.get("headers"),
        session=session,
        retry=client_cfg.get("retry"),
    )

    resources: List[DltResource] = []
    by_name: Dict[str, Dict[str, Any]] = {r["name"]: r for r in config["resources"]}

    def make_fetcher(
        rcfg: Dict[str, Any]
    ) -> tuple:
        """Returns ``(fetch, incremental | None)``; the fetcher reads the
        Incremental's CURRENT ``last_value`` on every call, so restored
        pipeline state narrows the requests of the next run (reference
        ``paginate_resource``, config_setup.py:1093-1139)."""
        endpoint = rcfg["endpoint"] if isinstance(rcfg.get("endpoint"), dict) else {"path": rcfg["endpoint"]}
        inc, start_param, end_param, convert = _setup_incremental(endpoint)
        if inc is not None and inc.primary_key is None:
            # boundary dedup must key on the RESOURCE primary key, not
            # whole-row hashes: a boundary row re-served with the same
            # pk but an updated payload would otherwise append a
            # duplicate pk (reference extract/incremental/transform.py:
            # 104-117 resolves primary_key from the resource hint)
            pk = rcfg.get("primary_key")
            if pk is not None:
                inc.primary_key = [pk] if isinstance(pk, str) else list(pk)

        def fetch() -> Iterable[dict]:
            params = dict(endpoint.get("params") or {})
            resolve = {
                k: v
                for k, v in params.items()
                if isinstance(v, dict) and v.get("type") == "resolve"
            }
            static = {
                k: v
                for k, v in params.items()
                if k not in resolve
                and not isinstance(v, Incremental)
                and not (isinstance(v, dict) and v.get("type") == "incremental")
            }
            if inc is not None:
                static = {
                    k: _expand_incremental_placeholders(v, inc, convert)
                    for k, v in static.items()
                }
                static = _bind_incremental_params(
                    static, inc, start_param, end_param, convert
                )
            pag = endpoint.get("paginator") or client_cfg.get("paginator")
            actions = endpoint.get("response_actions")
            base_path = _expand_incremental_placeholders(endpoint["path"], inc, convert)
            if not resolve:
                for page in client.paginate(
                    base_path, static, pag, endpoint.get("data_selector"),
                    response_actions=actions,
                ):
                    yield from page
                return
            # parent-child: fetch parent items, substitute each into path
            ((pname, spec),) = resolve.items()
            parent_cfg = by_name[spec["resource"]]
            for parent_item in make_fetcher(parent_cfg)[0]():
                path = base_path.format(**{pname: parent_item[spec["field"]]})
                for page in client.paginate(
                    path, static, pag, endpoint.get("data_selector"),
                    response_actions=actions,
                ):
                    yield from page

        return fetch, inc

    for rcfg in config["resources"]:
        fetch, inc = make_fetcher(rcfg)
        res = DltResource(
            fetch,
            name=rcfg["name"],
            table_name=rcfg.get("table_name", rcfg["name"]),
            write_disposition=rcfg.get("write_disposition", "append"),
            primary_key=rcfg.get("primary_key"),
            incremental=inc,
        )
        resources.append(res)
    return DltSource(name, resources)
