"""Source tests: filesystem readers, REST client (fake transport,
paginators, auth, parent-child resolve), JDBC option construction."""

import json

import pytest

from dlt_spark.sources import rest_api as ra
from dlt_spark.sources.filesystem import read_csv, read_jsonl, read_location
from dlt_spark.sources.sql_database import build_incremental_where, sql_table_options
from dlt_spark.incremental import Incremental


# ------------------------------------------------------------ filesystem

def test_read_csv_and_jsonl(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(csv))
    rows = df.orderBy("a").collect()
    assert [r["a"] for r in rows] == [1, 2]
    assert rows[0]["_file_url"].endswith("data.csv")

    jl = tmp_path / "data.jsonl"
    jl.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_jsonl(spark, str(jl)).count() == 2
    assert read_location(spark, str(jl)).count() == 2


# ------------------------------------------------------------ rest client

class FakeServer:
    """Transport double mirroring the (method,url,headers,body) session
    contract; serves /users pages and /users/{id}/orders."""

    def __init__(self):
        self.requests = []

    def __call__(self, method, url, headers, body):
        from urllib.parse import parse_qs, urlparse

        self.requests.append((method, url, dict(headers)))
        u = urlparse(url)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path.endswith("/token"):
            return 200, {}, json.dumps({"access_token": "tok-123"}).encode()
        if u.path.endswith("/users"):
            page = int(q.get("page", 1))
            data = {1: [{"id": 1}, {"id": 2}], 2: [{"id": 3}]}.get(page, [])
            return 200, {}, json.dumps({"users": data}).encode()
        if u.path.endswith("/cursor_items"):
            cur = q.get("cursor")
            if cur is None:
                return 200, {}, json.dumps({"items": [{"v": 1}], "next_cursor": "c2"}).encode()
            if cur == "c2":
                return 200, {}, json.dumps({"items": [{"v": 2}]}).encode()
        if "/orders" in u.path:
            uid = int(u.path.split("/")[-2])
            return 200, {}, json.dumps([{"order": uid * 10}]).encode()
        return 404, {}, b""


def test_page_number_pagination_and_selector():
    server = FakeServer()
    client = ra.RESTClient("https://api.test", session=server)
    pages = list(
        client.paginate("/users", paginator=ra.PageNumberPaginator(), data_selector="users")
    )
    assert [len(p) for p in pages if p] == [2, 1]


def test_cursor_paginator():
    server = FakeServer()
    client = ra.RESTClient("https://api.test", session=server)
    items = [
        i
        for page in client.paginate(
            "/cursor_items",
            paginator=ra.JSONResponseCursorPaginator("next_cursor", "cursor"),
            data_selector="items",
        )
        for i in page
    ]
    assert [i["v"] for i in items] == [1, 2]


def test_auth_headers():
    assert ra.BearerTokenAuth("t").headers() == {"Authorization": "Bearer t"}
    assert ra.APIKeyAuth("X-Key", "k").headers() == {"X-Key": "k"}
    assert "Basic" in ra.HttpBasicAuth("u", "p").headers()["Authorization"]
    server = FakeServer()
    oauth = ra.OAuth2ClientCredentials("https://api.test/token", "cid", "sec", session=server)
    assert oauth.headers() == {"Authorization": "Bearer tok-123"}
    assert oauth.headers() == {"Authorization": "Bearer tok-123"}  # cached
    assert len([r for r in server.requests if "/token" in r[1]]) == 1


def test_rest_api_source_with_resolve(spark, tmp_path):
    import dlt_spark

    server = FakeServer()
    src = ra.rest_api_source(
        {
            "client": {"base_url": "https://api.test"},
            "resources": [
                {
                    "name": "users",
                    "endpoint": {
                        "path": "/users",
                        "data_selector": "users",
                        "paginator": ra.PageNumberPaginator(),
                    },
                },
                {
                    "name": "orders",
                    "endpoint": {
                        "path": "/users/{user_id}/orders",
                        "params": {
                            "user_id": {"type": "resolve", "resource": "users", "field": "id"}
                        },
                    },
                },
            ],
        },
        session=server,
    )
    pipe = dlt_spark.pipeline("rest_t", str(tmp_path / "d"), "ds", spark)
    pipe.run(src)
    ds = pipe.dataset()
    assert ds["users"].row_count() == 3
    orders = sorted(r["order"] for r in ds["orders"].spark_df().collect())
    assert orders == [10, 20, 30]


# ------------------------------------------------------------ jdbc

def test_incremental_where_rendering():
    inc = Incremental("updated_at", initial_value="2024-01-01", range_start="closed")
    assert build_incremental_where(inc) == "updated_at >= '2024-01-01'"
    inc2 = Incremental("id", initial_value=5, end_value=10, range_start="open")
    assert build_incremental_where(inc2) == "id > 5 AND id < 10"
    inc2c = Incremental("id", initial_value=5, end_value=10)
    assert build_incremental_where(inc2c) == "id >= 5 AND id < 10"
    inc3 = Incremental("ts", on_cursor_value_missing="exclude")
    assert build_incremental_where(inc3) == "ts IS NOT NULL"


def test_jdbc_options():
    inc = Incremental("id", initial_value=100, range_start="open")
    opts = sql_table_options("events", inc, partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=16)
    assert opts["dbtable"] == "(SELECT * FROM events WHERE id > 100) AS events_src"
    assert opts["numPartitions"] == "16"
    with pytest.raises(ValueError):
        sql_table_options("t", None, partition_column="id")


# ------------------------------------------------- response actions


def test_response_action_404_ignore():
    """404 -> ignore ends pagination quietly (reference config_setup.py
    IgnoreResponseException path): missing endpoint yields zero pages, no
    raise."""
    server = FakeServer()
    client = ra.RESTClient("https://api.test", session=server)
    pages = list(
        client.paginate(
            "/missing",
            response_actions=[{"status_code": 404, "action": "ignore"}],
        )
    )
    assert pages == []


def test_response_action_unhandled_status_still_raises():
    server = FakeServer()
    client = ra.RESTClient("https://api.test", session=server)
    with pytest.raises(RuntimeError, match="404"):
        list(
            client.paginate(
                "/missing",
                response_actions=[{"status_code": 500, "action": "ignore"}],
            )
        )


def test_response_action_content_transform():
    """Callable action mutates response content before parsing (reference
    create_response_hooks docstring example: remove a field)."""
    server = FakeServer()

    def strip_id_2(resp):
        payload = resp.json()
        payload["users"] = [u for u in payload["users"] if u["id"] != 2]
        resp._content = json.dumps(payload).encode()

    client = ra.RESTClient("https://api.test", session=server)
    pages = list(
        client.paginate(
            "/users",
            paginator=ra.PageNumberPaginator(),
            data_selector="users",
            response_actions=[{"status_code": 200, "action": strip_id_2}],
        )
    )
    ids = [u["id"] for p in pages for u in p]
    assert ids == [1, 3]


def test_response_action_content_match_and_bare_callable():
    server = FakeServer()
    seen = []

    def observer(resp):
        seen.append(resp.status_code)

    client = ra.RESTClient("https://api.test", session=server)
    pages = list(
        client.paginate(
            "/users",
            paginator=ra.PageNumberPaginator(),
            data_selector="users",
            response_actions=[observer, {"content": "no-such-text", "action": "ignore"}],
        )
    )
    assert [len(p) for p in pages if p] == [2, 1]  # content didn't match -> no ignore
    assert seen and all(s == 200 for s in seen)


def test_response_actions_in_source_config(spark):
    server = FakeServer()
    src = ra.rest_api_source(
        {
            "client": {"base_url": "https://api.test"},
            "resources": [
                {
                    "name": "ghosts",
                    "endpoint": {
                        "path": "/missing",
                        "response_actions": [{"status_code": 404, "action": "ignore"}],
                    },
                }
            ],
        },
        session=server,
    )
    items = list(src.resources["ghosts"]._iter_items_for_test()) if hasattr(
        src.resources["ghosts"], "_iter_items_for_test"
    ) else list(src.resources["ghosts"]._data())
    assert items == []


# ------------------------------------ declarative endpoint incremental


class IncServer:
    """Serves ``/events?since=N&page=P``: events with ``ts >= since``,
    two per page.  Records every ``since`` it was asked for."""

    def __init__(self):
        self.events = [{"id": i, "ts": i * 10} for i in range(1, 5)]  # ts 10..40
        self.since_seen = []

    def __call__(self, method, url, headers, body):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(url)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        since = int(q.get("since", 0))
        until = int(q["until"]) if "until" in q else None
        self.since_seen.append(since)
        rows = [e for e in self.events if e["ts"] >= since]
        if until is not None:
            rows = [e for e in rows if e["ts"] < until]
        page = int(q.get("page", 1))
        out = rows[(page - 1) * 2 : page * 2]
        return 200, {}, json.dumps({"events": out}).encode()


def _inc_source(server, params=None, endpoint_extra=None):
    endpoint = {
        "path": "/events",
        "data_selector": "events",
        "paginator": ra.PageNumberPaginator(),
        "params": params or {},
    }
    endpoint.update(endpoint_extra or {})
    return ra.rest_api_source(
        {
            "client": {"base_url": "https://api.test"},
            "resources": [
                {"name": "events", "endpoint": endpoint, "primary_key": ["id"]}
            ],
        },
        session=server,
    )


def test_rest_incremental_param_binds_cursor_and_roundtrips_state(spark, tmp_path):
    """Reference config_setup.py:214-255: a param valued
    {"type": "incremental"} binds last_value into that request param; the
    second pipeline run must ask the API only for data past the stored
    cursor and load only the new rows."""
    import dlt_spark

    server = IncServer()
    params = {"since": {"type": "incremental", "cursor_path": "ts", "initial_value": 0}}
    pipe = dlt_spark.pipeline("rest_inc", str(tmp_path / "d"), "ds", spark)
    pipe.run(_inc_source(server, params))
    assert pipe.dataset()["events"].row_count() == 4
    assert server.since_seen and all(s == 0 for s in server.since_seen)

    # new data lands server-side; a FRESH source (fresh Incremental) must
    # restore the cursor from pipeline state and fetch only past it
    server.events.append({"id": 5, "ts": 50})
    server.since_seen.clear()
    pipe.run(_inc_source(server, params))
    assert server.since_seen and all(s == 40 for s in server.since_seen)
    rows = sorted(r["id"] for r in pipe.dataset()["events"].spark_df().collect())
    # boundary row (ts=40, already loaded) deduped; only id 5 is new
    assert rows == [1, 2, 3, 4, 5]


def test_rest_incremental_endpoint_level_start_end_params(spark, tmp_path):
    """Endpoint-level incremental block with start_param/end_param
    (reference config_setup.py:261-277): both bounds bind into the
    request; end_value also caps the loaded window."""
    import dlt_spark

    server = IncServer()
    src = _inc_source(
        server,
        endpoint_extra={
            "incremental": {
                "cursor_path": "ts",
                "initial_value": 0,
                "end_value": 40,
                "start_param": "since",
                "end_param": "until",
            }
        },
    )
    pipe = dlt_spark.pipeline("rest_inc2", str(tmp_path / "d2"), "ds", spark)
    pipe.run(src)
    rows = sorted(r["ts"] for r in pipe.dataset()["events"].spark_df().collect())
    assert rows == [10, 20, 30]  # until=40 is exclusive (range_end open)
    # the server only ever saw the bounded window
    assert all(s == 0 for s in server.since_seen)


def test_rest_incremental_convert_and_placeholder(spark, tmp_path):
    """`convert` maps the cursor to the wire format; `{incremental.start_value}`
    placeholders expand in params (reference paginate_resource
    config_setup.py:1108-1126)."""
    server = IncServer()
    src = _inc_source(
        server,
        endpoint_extra={
            "incremental": {
                "cursor_path": "ts",
                "initial_value": 15,
                "start_param": "since",
                "convert": lambda v: int(v),
            }
        },
    )
    items = list(src.resources["events"]._data())
    assert {e["id"] for e in items} == {2, 3, 4}
    assert server.since_seen and all(s == 15 for s in server.since_seen)

    # placeholder form, no start_param at all
    server2 = IncServer()
    src2 = _inc_source(
        server2,
        params={"since": "{incremental.start_value}"},
        endpoint_extra={
            "incremental": {"cursor_path": "ts", "initial_value": 25}
        },
    )
    items2 = list(src2.resources["events"]._data())
    assert {e["id"] for e in items2} == {3, 4}
    assert server2.since_seen[0] == 25


def test_rest_incremental_config_validation():
    server = IncServer()
    with pytest.raises(ValueError, match="single incremental"):
        _inc_source(
            server,
            params={
                "a": {"type": "incremental", "cursor_path": "ts"},
                "b": {"type": "incremental", "cursor_path": "ts"},
            },
        )
    with pytest.raises(ValueError, match="end_value"):
        _inc_source(
            server,
            params={
                "since": {
                    "type": "incremental",
                    "cursor_path": "ts",
                    "initial_value": 0,
                    "end_value": 99,
                }
            },
        )
    from dlt_spark.incremental import Incremental as Inc

    with pytest.raises(TypeError, match="start_param"):
        _inc_source(server, endpoint_extra={"incremental": Inc("ts")})


def test_rest_incremental_instance_as_param(spark, tmp_path):
    """A ready Incremental instance as a param value (reference
    config_setup.py:233-242)."""
    from dlt_spark.incremental import Incremental as Inc

    server = IncServer()
    src = _inc_source(server, params={"since": Inc("ts", initial_value=35)})
    items = list(src.resources["events"]._data())
    assert {e["id"] for e in items} == {4}
    assert server.since_seen[0] == 35


def test_filesystem_storage_options_land_on_hadoop_conf(spark):
    """Cloud credentials map onto the Hadoop conf the Spark readers
    consult (reference bucket credentials, filesystem/__init__.py:96 +
    configuration/specs field names).  S3 keys are scoped per bucket so
    two buckets with different credentials coexist in one session.  The
    cloud connector jars aren't in this container, so the assertion is
    on the conf, not a live read."""
    from dlt_spark.sources.filesystem import apply_storage_options

    conf = spark.sparkContext._jsc.hadoopConfiguration()
    apply_storage_options(
        spark,
        "s3a://bucket-a/prefix",
        {
            "aws_access_key_id": "AKIA_A",
            "aws_secret_access_key": "SECRET_A",
            "aws_session_token": "TOK_A",
            "endpoint_url": "https://minio.local:9000",
        },
    )
    apply_storage_options(
        spark, "s3a://bucket-b", {"aws_access_key_id": "AKIA_B",
                                  "aws_secret_access_key": "SECRET_B"}
    )
    assert conf.get("fs.s3a.bucket.bucket-a.access.key") == "AKIA_A"
    assert conf.get("fs.s3a.bucket.bucket-a.session.token") == "TOK_A"
    assert conf.get("fs.s3a.bucket.bucket-a.endpoint") == "https://minio.local:9000"
    assert (
        conf.get("fs.s3a.bucket.bucket-a.aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    )
    # per-bucket isolation: bucket-b keeps its own keys
    assert conf.get("fs.s3a.bucket.bucket-b.access.key") == "AKIA_B"
    assert conf.get("fs.s3a.bucket.bucket-b.session.token") is None

    apply_storage_options(
        spark, "abfss://cont@acct.dfs.core.windows.net/x",
        {"azure_storage_account_name": "acct",
         "azure_storage_account_key": "AZKEY"},
    )
    assert conf.get("fs.azure.account.key.acct.dfs.core.windows.net") == "AZKEY"
    assert (
        conf.get("fs.azure.account.auth.type.acct.dfs.core.windows.net")
        == "SharedKey"
    )

    apply_storage_options(
        spark, "gs://data-bucket",
        {"project_id": "proj-1", "private_key": "PKEY",
         "client_email": "sa@proj-1.iam.gserviceaccount.com"},
    )
    assert conf.get("fs.gs.project.id") == "proj-1"
    assert conf.get("fs.gs.auth.service.account.private.key") == "PKEY"

    # raw Hadoop keys pass through as an escape hatch
    apply_storage_options(
        spark, "s3a://bucket-c", {"fs.s3a.path.style.access": "true"}
    )
    assert conf.get("fs.s3a.path.style.access") == "true"

    # no credentials: a no-op, never raises
    apply_storage_options(spark, "s3a://bucket-d", None)


def test_rest_incremental_inherits_resource_primary_key(spark, tmp_path):
    """The declarative incremental must dedup boundary rows on the
    RESOURCE primary key, not whole-row hashes (reference
    extract/incremental/transform.py:104-117 resolves primary_key from
    the resource hint): a boundary row re-served with the same pk but an
    UPDATED payload is still a duplicate pk and must be dropped."""
    import dlt_spark

    server = IncServer()
    for e in server.events:
        e["val"] = 0
    params = {"since": {"type": "incremental", "cursor_path": "ts", "initial_value": 0}}
    src = _inc_source(server, params)
    assert src.resources["events"].incremental.primary_key == ["id"]

    pipe = dlt_spark.pipeline("rest_pk", str(tmp_path / "d"), "ds", spark)
    pipe.run(src)
    # boundary row (id=4, ts=40) gets a changed payload server-side; the
    # second run re-serves it (ts >= 40) alongside one genuinely new row
    server.events[-1]["val"] = 99
    server.events.append({"id": 5, "ts": 50, "val": 1})
    pipe.run(_inc_source(server, params))
    ids = sorted(r["id"] for r in pipe.dataset()["events"].spark_df().collect())
    assert ids == [1, 2, 3, 4, 5]  # no duplicate pk 4


def test_rest_incremental_unset_placeholder_raises():
    """`{incremental.end_value}` with no configured end_value must raise,
    not interpolate the literal text 'None' into the request."""
    server = IncServer()
    src = _inc_source(
        server,
        params={"until": "{incremental.end_value}"},
        endpoint_extra={"incremental": {"cursor_path": "ts", "initial_value": 0}},
    )
    with pytest.raises(ValueError, match="end_value"):
        list(src.resources["events"]._data())


# ------------------------------------------------- duckdb csv + s3 naming


def test_read_csv_duckdb(spark, tmp_path):
    """DuckDB-engine CSV import handles typed casts + chunked Arrow
    transfer (reference readers.py:101 _read_csv_duckdb)."""
    from dlt_spark.sources.filesystem import read_csv_duckdb

    p = tmp_path / "messy.csv"
    p.write_text("id,when,amt\n1,2024-01-02,3.5\n2,2024-02-03,4.25\n3,2024-03-04,0.5\n")
    df = read_csv_duckdb(spark, str(p), chunk_size=2)
    assert df.count() == 3
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["amt"] == "double"
    assert types["when"] == "date"
    assert df.filter("_file_url IS NOT NULL").count() == 3


def test_s3_tables_naming():
    from dlt_spark.schema.naming import naming_from_name

    n = naming_from_name("s3_tables")
    # table ids: snake_case + leading underscores stripped (AWS rule)
    assert n.normalize_table_identifier("_dltLoadId") == "dlt_load_id"
    # column ids keep leading underscores (only tables differ)
    assert n.normalize_identifier("_dlt_id") == "_dlt_id"
    assert n.max_length == 255
    import pytest as _pytest
    with _pytest.raises(ValueError, match="may not exceed"):
        naming_from_name("s3_tables", max_length=300)


def test_read_orc_and_xml_roundtrip(spark, tmp_path):
    """Beyond-reference file formats: ORC (Spark-native) and XML
    (built-in source since Spark 4) read through the filesystem source
    with the shared _file_url provenance column; avro raises a clear
    classpath error when the external jar is absent."""
    import pytest

    from dlt_spark.sources.filesystem import read_avro, read_location

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    orc_dir = str(tmp_path / "t.orc")
    df.write.orc(orc_dir)
    got = read_location(spark, orc_dir, fmt="orc")
    assert got.count() == 2 and "_file_url" in got.columns

    xml_dir = str(tmp_path / "t.xml")
    df.write.format("xml").option("rootTag", "rows").option(
        "rowTag", "row"
    ).save(xml_dir)
    got = read_location(spark, xml_dir, fmt="xml")
    assert got.count() == 2 and "_file_url" in got.columns
    assert {r["v"] for r in got.collect()} == {"a", "b"}

    with pytest.raises((ImportError, Exception)):
        read_avro(spark, str(tmp_path / "nope.avro"))


def test_relation_write_orc_xml_roundtrip(spark, tmp_path):
    """Relation exports for the round-8 formats round-trip through the
    filesystem readers."""
    from dlt_spark.dataset.relation import Relation
    from dlt_spark.sources.filesystem import read_location

    rel = Relation(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string"), "t"
    )
    rel.write_orc(str(tmp_path / "o"))
    assert read_location(spark, str(tmp_path / "o"), fmt="orc").count() == 2
    rel.write_xml(str(tmp_path / "x"))
    got = read_location(spark, str(tmp_path / "x"), fmt="xml")
    assert {r["v"] for r in got.collect()} == {"x", "y"}
