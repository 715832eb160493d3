"""REST DataSource: pushdown, pagination, auth — against an in-process
fake backend (reference test model: DummyActions fakes, no real
warehouse; ``connectors/warehouse_a/test.py:38-92``)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.sources import rest
from hrtech_etl_spark.sources.rest import RestConfig, compile_pushed_params

# ---------------------------------------------------------------------------
# Fake warehouse backend
# ---------------------------------------------------------------------------

JOBS = [
    {
        "job_id": i,
        "status": "open" if i % 3 else "closed",
        "score": round(i / 57.0, 4),
        "title": f"job number {i}" + (" python" if i % 5 == 0 else ""),
        "updated_at": f"2024-01-{(i % 28) + 1:02d}",
    }
    for i in range(57)
]

REQUESTS: list[dict] = []  # one entry per GET: {"path", "params", "headers"}
FLAKY_HITS: dict[str, int] = {}  # per-offset attempt counter for /jobs_flaky

OAUTH1_CREDS = {
    "client_key": "ck-1",
    "client_secret": "cs-2",
    "resource_owner_key": "rok-3",
    "resource_owner_secret": "ros-4",
}


def _verify_oauth1(auth_header: str, method: str, url: str, params: dict) -> bool:
    """Server-side RFC 5849 verification: re-derive the signature from
    the request's own method/URL/params plus the header's timestamp and
    nonce, using the shared secrets; accept only on exact match."""
    import re
    from urllib.parse import unquote

    from hrtech_etl_spark.sources.auth import OAuth1Auth

    if not auth_header.startswith("OAuth "):
        return False
    fields = {
        unquote(k): unquote(v)
        for k, v in re.findall(r'([a-z_]+)="([^"]*)"', auth_header)
    }
    signer = OAuth1Auth(
        **OAUTH1_CREDS,
        timestamp_nonce=lambda: (fields["oauth_timestamp"], fields["oauth_nonce"]),
    )
    return signer.sign(method, url, params)["Authorization"] == auth_header


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if urlparse(self.path).path == "/login":
            self._send({"session_token": "tok-123"})
        elif urlparse(self.path).path == "/oauth/token":
            self._send({"access_token": "oat-456"})
        else:
            self._send({"error": "not found"}, 404)

    def do_GET(self):
        parsed = urlparse(self.path)
        params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        REQUESTS.append(
            {"path": parsed.path, "params": params, "headers": dict(self.headers)}
        )
        if parsed.path == "/jobs_flaky":
            # first two hits per offset fail with 500; third succeeds
            key = params.get("offset", "0")
            FLAKY_HITS[key] = FLAKY_HITS.get(key, 0) + 1
            if FLAKY_HITS[key] <= 2:
                return self._send({"error": "transient"}, 503)
        if parsed.path == "/jobs_auth":
            if self.headers.get("X-API-Key") != "sekret":
                return self._send({"error": "forbidden"}, 403)
        if parsed.path == "/jobs_login":
            if self.headers.get("Authorization") != "Bearer tok-123":
                return self._send({"error": "forbidden"}, 403)
        if parsed.path in ("/jobs_oauth1", "/jobs_oauth1_flaky"):
            if parsed.path == "/jobs_oauth1_flaky":
                key = "oauth1_" + params.get("offset", "0")
                FLAKY_HITS[key] = FLAKY_HITS.get(key, 0) + 1
                if FLAKY_HITS[key] <= 2:
                    return self._send({"error": "transient"}, 503)
            ok = _verify_oauth1(
                self.headers.get("Authorization", ""),
                "GET",
                f"http://{self.headers['Host']}{parsed.path}",
                params,
            )
            if not ok:
                return self._send({"error": "bad signature"}, 401)

        rows = JOBS
        if "status" in params:
            rows = [r for r in rows if r["status"] == params["status"]]
        if "job_id__in" in params:
            ids = {int(x) for x in params["job_id__in"].split(",")}
            rows = [r for r in rows if r["job_id"] in ids]
        if "updated_at_min" in params:
            rows = [r for r in rows if r["updated_at"] >= params["updated_at_min"]]
        if "updated_at_max" in params:
            rows = [r for r in rows if r["updated_at"] <= params["updated_at_max"]]
        if "q" in params:
            # recall-oriented search: backend matches any term, Spark
            # re-verifies exact substring semantics
            terms = (
                params["q"].replace("(", " ").replace(")", " ")
                .replace(" AND ", " ").replace(" OR ", " ").split()
            )
            rows = [r for r in rows if any(t in r["title"] for t in terms)]

        limit = int(params.get("limit", 1000))
        if parsed.path == "/jobs_cursor":
            start = int(params.get("cursor", 0))
            page = rows[start : start + limit]
            nxt = str(start + limit) if start + limit < len(rows) else None
            return self._send({"data": page, "next": nxt})
        offset = int(params.get("offset", 0))
        self._send({"data": rows[offset : offset + limit]})


@pytest.fixture(scope="module")
def backend():
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


SCHEMA = "job_id long, status string, score double, title string, updated_at string"
PUSHABLE = json.dumps(
    {
        "status": ["eq"],
        "job_id": ["in"],
        "updated_at": ["gte", "lte"],
        "title": ["contains"],
    }
)
RANGE_BINDINGS = json.dumps(
    {"updated_at": {"gte": "updated_at_min", "lte": "updated_at_max"}}
)
SEARCH_BINDINGS = json.dumps(
    {"title": {"search_field": "q", "value_join": " OR "}}
)


def reader_for(backend, spark, path="/jobs", **opts):
    rest.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    r = (
        spark.read.format("hrtech_rest")
        .schema(SCHEMA)
        .option("url", backend + path)
        .option("page_size", "20")
        .option("num_partitions", "3")
        .option("pushable", PUSHABLE)
        .option("range_bindings", RANGE_BINDINGS)
        .option("search_bindings", SEARCH_BINDINGS)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r


def test_full_scan_offset_parallel(backend, spark):
    REQUESTS.clear()
    df = reader_for(backend, spark).load()
    rows = df.collect()
    assert {r["job_id"] for r in rows} == set(range(57))
    assert len(rows) == 57  # parallel offset partitions: complete, no dupes
    # 3 partitions walk interleaved offsets (0,60 / 20,80 / 40); a
    # partition only stops after a short/empty page, so full-page
    # partitions probe one page past the end
    offsets = sorted(int(r["params"].get("offset", 0)) for r in REQUESTS)
    assert offsets == [0, 20, 40, 60, 80]
    assert len(set(offsets)) == len(offsets)  # no offset fetched twice


def test_eq_pushdown_reaches_backend(backend, spark):
    REQUESTS.clear()
    df = reader_for(backend, spark).load().where(F.col("status") == "open")
    assert df.count() == len([r for r in JOBS if r["status"] == "open"])
    assert all(r["params"].get("status") == "open" for r in REQUESTS)


def test_residual_filter_not_pushed_still_correct(backend, spark):
    REQUESTS.clear()
    df = (
        reader_for(backend, spark)
        .load()
        .where((F.col("score") > 0.5) & (F.col("status") == "open"))
    )
    want = [r for r in JOBS if r["score"] > 0.5 and r["status"] == "open"]
    assert df.count() == len(want)
    # score is not pushable -> stays out of backend params, Spark applies it
    assert all("score" not in r["params"] for r in REQUESTS)
    assert all(r["params"].get("status") == "open" for r in REQUESTS)


def test_in_pushdown_csv_encoding(backend, spark):
    REQUESTS.clear()
    df = reader_for(backend, spark).load().where(F.col("job_id").isin(3, 7, 11))
    assert {r["job_id"] for r in df.collect()} == {3, 7, 11}
    ins = {r["params"].get("job_id__in") for r in REQUESTS}
    assert len(ins) == 1
    assert set(next(iter(ins)).split(",")) == {"3", "7", "11"}


def test_range_pushdown_binding_params(backend, spark):
    REQUESTS.clear()
    df = (
        reader_for(backend, spark)
        .load()
        .where((F.col("updated_at") >= "2024-01-10") & (F.col("updated_at") <= "2024-01-20"))
    )
    want = [r for r in JOBS if "2024-01-10" <= r["updated_at"] <= "2024-01-20"]
    assert df.count() == len(want)
    p = REQUESTS[-1]["params"]
    assert p.get("updated_at_min") == "2024-01-10"
    assert p.get("updated_at_max") == "2024-01-20"


def test_contains_pushed_and_reverified(backend, spark):
    REQUESTS.clear()
    df = reader_for(backend, spark).load().where(F.col("title").contains("python"))
    want = [r for r in JOBS if "python" in r["title"]]
    assert df.count() == len(want)
    assert all(r["params"].get("q") == "python" for r in REQUESTS)


def test_api_key_auth_header(backend, spark):
    REQUESTS.clear()
    df = reader_for(
        backend,
        spark,
        path="/jobs_auth",
        auth=json.dumps(
            {"auth_type": "api_key", "header_name": "X-API-Key", "api_key": "sekret"}
        ),
    ).load()
    assert df.count() == 57
    assert all(r["headers"].get("X-API-Key") == "sekret" for r in REQUESTS)


def test_login_auth_flow(backend, spark):
    REQUESTS.clear()
    df = reader_for(
        backend,
        spark,
        path="/jobs_login",
        auth=json.dumps(
            {"auth_type": "login", "base_url": backend, "username": "u", "password": "p"}
        ),
    ).load()
    assert df.count() == 57
    assert all(
        r["headers"].get("Authorization") == "Bearer tok-123" for r in REQUESTS
    )


def test_retry_on_transient_5xx(backend, spark):
    """Each page GET retries through two 503s (bounded exponential
    backoff) and completes with the full result set — idempotent page
    reads make retries safe."""
    FLAKY_HITS.clear()
    df = reader_for(
        backend, spark, path="/jobs_flaky", retry_backoff_s="0.05"
    ).load()
    assert df.count() == 57
    # every offset needed exactly 3 attempts (2 failures + 1 success)
    assert FLAKY_HITS and all(v == 3 for v in FLAKY_HITS.values())


def test_oauth2_client_credentials_flow(backend, spark):
    """Token fetched from token_url via client-credentials grant, then
    sent as a Bearer header; cached per reader instance."""
    from hrtech_etl_spark.sources.auth import OAuth2Auth, build_auth

    auth = build_auth(
        {
            "auth_type": "oauth2",
            "client_id": "cid",
            "client_secret": "sec",
            "token_url": backend + "/oauth/token",
        }
    )
    assert isinstance(auth, OAuth2Auth)
    headers = auth.build_headers()
    assert headers["Authorization"] == "Bearer oat-456"
    # cached: second call does not refetch (transport would fail loudly
    # if token_url were hit again with a broken URL)
    auth.token_url = "http://127.0.0.1:1/closed"
    assert auth.build_headers()["Authorization"] == "Bearer oat-456"


def test_oauth1_per_request_signing(backend, spark):
    """OAuth1 signatures are request-bound: every page request from
    every executor partition must carry a signature covering ITS OWN
    params (offset/limit differ per request), verified server-side by
    re-deriving the RFC 5849 signature from the shared secrets. A
    single static header would 401 on all but one request."""
    REQUESTS.clear()
    df = reader_for(
        backend,
        spark,
        path="/jobs_oauth1",
        auth=json.dumps({"auth_type": "oauth1", **OAUTH1_CREDS}),
    ).load()
    assert {r["job_id"] for r in df.collect()} == set(range(57))
    sigs = {
        r["headers"].get("Authorization")
        for r in REQUESTS
        if r["path"] == "/jobs_oauth1"
    }
    # several requests (3 partitions x pages), each a distinct signature
    assert len(sigs) >= 3 and all(s and s.startswith("OAuth ") for s in sigs)


def test_oauth1_sign_url_query_and_list_params():
    """RFC 5849 parameter normalization edges: query params embedded
    in the URL join the signature base; list values expand to repeated
    keys; default ports drop from the base URL; the signature is
    invariant to where a parameter travels (URL vs params dict)."""
    from hrtech_etl_spark.sources.auth import OAuth1Auth

    auth = OAuth1Auth(
        **OAUTH1_CREDS,
        timestamp_nonce=lambda: ("1500000000", "fixednonce"),
    )
    # same request expressed two ways -> identical signature
    a = auth.sign("GET", "https://api.example.com:443/r?b=2&a=1", {"c": "3"})
    b = auth.sign("GET", "https://API.example.com/r", {"b": "2", "a": "1", "c": "3"})
    assert a == b
    # list values expand like urlencode(doseq): order-insensitive
    # after sorting, so ["x","y"] == two separate pairs
    c = auth.sign("GET", "https://api.example.com/r", {"k": ["y", "x"], "z": "1"})
    d = auth.sign("GET", "https://api.example.com/r?k=x&k=y", {"z": "1"})
    assert c == d
    # non-default port stays in the base URL -> different signature
    e = auth.sign("GET", "https://api.example.com:8443/r", {"a": "1"})
    f = auth.sign("GET", "https://api.example.com/r", {"a": "1"})
    assert e != f


def test_oauth1_retry_resigns_fresh_nonce(backend, spark):
    """Retries must NOT replay the previous attempt's OAuth1 header:
    nonce-enforcing servers would 401 the replay. Each attempt at the
    flaky endpoint (503 twice per offset, then OK) must carry a
    distinct signature, and the third, freshly-signed attempt passes
    server-side verification."""
    REQUESTS.clear()
    df = reader_for(
        backend,
        spark,
        path="/jobs_oauth1_flaky",
        auth=json.dumps({"auth_type": "oauth1", **OAUTH1_CREDS}),
        num_partitions="1",
        page_size="100",
        retry_backoff_s="0.01",
    ).load()
    assert df.count() == 57
    auths = [
        r["headers"].get("Authorization")
        for r in REQUESTS
        if r["path"] == "/jobs_oauth1_flaky" and r["params"].get("offset", "0") == "0"
    ]
    assert len(auths) >= 3, "flaky endpoint should have forced retries"
    assert len(set(auths)) == len(auths), "retries replayed an OAuth1 nonce"


def test_cursor_pagination_sequential(backend, spark):
    REQUESTS.clear()
    df = reader_for(
        backend, spark, path="/jobs_cursor", pagination="cursor"
    ).load()
    rows = df.collect()
    assert {r["job_id"] for r in rows} == set(range(57))
    # sequential chain: cursor params 0(absent), 20, 40
    cursors = [r["params"].get("cursor") for r in REQUESTS]
    assert cursors == [None, "20", "40"]


# ---------------------------------------------------------------------------
# Composition: CLI incremental pull from a REST origin
# ---------------------------------------------------------------------------

def test_cli_pull_from_rest_origin(backend, spark, tmp_path, capsys):
    """End-to-end: registered REST connector → CLI pull with a pushed
    EQ prefilter and a cursor range that reaches the backend as the
    bound range param → parquet target + echoed cursor."""
    import json as j

    from hrtech_etl_spark import cli
    from hrtech_etl_spark.connectors import (
        ConnectorMeta,
        RestConnector,
        register_connector,
    )

    rest.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_connector(
        ConnectorMeta(
            name="rest_wh",
            factory=lambda: RestConnector(
                options={
                    "job": {
                        "url": backend + "/jobs",
                        "schema": SCHEMA,
                        "page_size": "20",
                        "num_partitions": "2",
                        "pushable": PUSHABLE,
                        "range_bindings": RANGE_BINDINGS,
                        "search_bindings": SEARCH_BINDINGS,
                    }
                }
            ),
        )
    )
    REQUESTS.clear()
    target = str(tmp_path / "rest_target")
    argv = [
        "pull",
        "--resource", "job",
        "--origin", "rest_wh",
        "--target", target,
        "--cursor-col", "updated_at",
        "--uid-col", "job_id",
        "--cursor-start", "2024-01-10",
        "--where", j.dumps([{"field": "status", "op": "eq", "value": "open"}]),
    ]
    assert cli.main(argv, spark=spark) == 0
    cur = j.loads(capsys.readouterr().out.strip())
    want = [
        r for r in JOBS if r["status"] == "open" and r["updated_at"] >= "2024-01-10"
    ]
    got = spark.read.parquet(f"{target}/jobs")
    assert got.count() == len(want)
    # both the EQ prefilter and the cursor range reached the backend
    assert all(r["params"].get("status") == "open" for r in REQUESTS)
    assert all(
        r["params"].get("updated_at_min") == "2024-01-10" for r in REQUESTS
    )
    assert cur["end"] == max(r["updated_at"] for r in want)


# ---------------------------------------------------------------------------
# Composition: full pull loop — REST origin → pipeline → table sink,
# cursor resume across two invocations (reference core/pipeline.py
# batched-cursor loop driven end to end over HTTP)
# ---------------------------------------------------------------------------

def test_rest_pull_resume_to_table_sink_e2e(backend, spark, tmp_path):
    """All four layers in one flow: wsgiref REST backend → registered
    RestConnector → ``pipeline.pull`` (invocation 1 bounded, invocation
    2 resuming from the advanced cursor) → TableConnector sink.
    Asserts SERVER-SIDE that both the EQ prefilter and the resumed
    cursor floor reach the backend as params, and that the sink holds
    exactly the filtered table once — no gap, no overlap — after the
    two appends."""
    from hrtech_etl_spark import pipeline
    from hrtech_etl_spark.connectors import (
        ConnectorMeta,
        RestConnector,
        TableConnector,
        get_connector_instance,
        register_connector,
    )
    from hrtech_etl_spark.core.types import Condition, Cursor, Resource

    register_connector(
        ConnectorMeta(
            name="rest_e2e_wh",
            factory=lambda: RestConnector(
                options={
                    "job": {
                        "url": backend + "/jobs",
                        "schema": SCHEMA,
                        "page_size": "20",
                        "num_partitions": "2",
                        "pushable": PUSHABLE,
                        "range_bindings": RANGE_BINDINGS,
                        "search_bindings": SEARCH_BINDINGS,
                    }
                }
            ),
        )
    )
    origin = get_connector_instance("rest_e2e_wh")
    sink = TableConnector(root=str(tmp_path / "wh"))
    where = [Condition("status", "eq", "open")]
    want = [r for r in JOBS if r["status"] == "open"]

    # --- invocation 1: bounded slice [2024-01-01 .. 2024-01-14] -----
    REQUESTS.clear()
    src = origin.read_resource(spark, Resource.JOB)
    res1 = pipeline.pull(
        src,
        cursor=Cursor(start="2024-01-01", end="2024-01-14"),
        cursor_col="updated_at",
        uid_col="job_id",
        where=where,
    )
    sink.write_resource(res1.dataframe, Resource.JOB)
    page1 = [r for r in want if r["updated_at"] <= "2024-01-14"]
    assert res1.cursor.end == max(r["updated_at"] for r in page1)
    assert res1.cursor.end_uid == max(
        r["job_id"] for r in page1 if r["updated_at"] == res1.cursor.end
    )
    assert REQUESTS, "invocation 1 never reached the backend"
    for r in REQUESTS:
        assert r["params"].get("status") == "open"
        assert r["params"].get("updated_at_min") == "2024-01-01"
        assert r["params"].get("updated_at_max") == "2024-01-14"

    # --- invocation 2: resume strictly after (end, end_uid) ---------
    REQUESTS.clear()
    res2 = pipeline.pull(
        origin.read_resource(spark, Resource.JOB),
        cursor=Cursor(start=res1.cursor.end, start_uid=res1.cursor.end_uid),
        cursor_col="updated_at",
        uid_col="job_id",
        where=where,
    )
    sink.write_resource(res2.dataframe, Resource.JOB)
    assert REQUESTS, "invocation 2 never reached the backend"
    for r in REQUESTS:
        assert r["params"].get("status") == "open"
        # the resumed floor is pushed: the tie-safe OR stays residual,
        # its implied coarse bound travels as the range param
        assert r["params"].get("updated_at_min") == res1.cursor.end
        assert "updated_at_max" not in r["params"]
    assert res2.cursor.end == max(r["updated_at"] for r in want)

    # --- sink: union of both appends is exactly the table, once -----
    got = sorted(
        r["job_id"]
        for r in sink.read_resource(spark, Resource.JOB).collect()
    )
    assert got == sorted(r["job_id"] for r in want)


# ---------------------------------------------------------------------------
# Param compilation unit tests (the reference's /api/debug/connector_params)
# ---------------------------------------------------------------------------

def test_compile_params_search_composition():
    cfg = RestConfig(
        url="http://x",
        search_bindings={
            "title": {"search_field": "q", "value_join": " OR "},
            "body": {"search_field": "q", "value_join": " OR "},
        },
    )
    params = compile_pushed_params(
        [("title", "contains", "a"), ("body", "contains", "b")], cfg
    )
    assert params["q"] == "(a) AND (b)"


def test_compile_params_in_json_encoding():
    cfg = RestConfig(url="http://x", in_encoding="json")
    params = compile_pushed_params([("job_id", "in", [1, 2])], cfg)
    assert params["job_id__in"] == '["1", "2"]'
