"""HTTP facade tests: drive the WSGI app directly (no server), mirror
the reference's endpoint contracts (app/api.py:35-386)."""

from __future__ import annotations

import io
import json

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.app import create_app
from hrtech_etl_spark.connectors import (
    ConnectorMeta,
    RestConnector,
    TableConnector,
    register_connector,
)


def call(app, method, path, body=None, query=""):
    raw = json.dumps(body or {}).encode()
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(raw)),
        "wsgi.input": io.BytesIO(raw),
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])

    chunks = app(environ, start_response)
    return captured["status"], json.loads(b"".join(chunks))


@pytest.fixture()
def app(spark):
    return create_app(spark_factory=lambda: spark)


@pytest.fixture()
def jobs_connector(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "eng 1", "2024-01-01 10:00:00", "open"),
            (2, "eng 2", "2024-02-01 10:00:00", "open"),
            (3, "ops 3", "2024-03-01 10:00:00", "closed"),
        ],
        ["uid", "title", "updated_at", "status"],
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "jobs"))
    register_connector(
        ConnectorMeta(
            name="api_wh",
            description="facade test warehouse",
            factory=lambda: TableConnector(root=str(tmp_path)),
        )
    )
    return "api_wh"


def test_health_and_connectors(app, jobs_connector):
    status, body = call(app, "GET", "/api/health")
    assert (status, body) == (200, {"status": "ok"})
    status, body = call(app, "GET", "/api/connectors")
    assert status == 200
    assert any(c["name"] == "api_wh" for c in body)


def test_unified_schema_endpoint(app):
    status, fields = call(app, "GET", "/api/schema/unified/job")
    assert status == 200
    names = {f["name"] for f in fields}
    assert {"id", "name", "updated_at"} <= names
    status, pref = call(
        app, "GET", "/api/schema/unified/job", query="only_prefilterable=true"
    )
    assert status == 200
    assert all(f["prefilter_operators"] for f in pref)
    assert len(pref) < len(fields)


def test_connector_schema_endpoint(app, jobs_connector):
    status, fields = call(app, "GET", f"/api/schema/{jobs_connector}/job")
    assert status == 200
    assert {f["name"] for f in fields} == {"uid", "title", "updated_at", "status"}
    status, body = call(app, "GET", "/api/schema/nope/job")
    assert status == 404


def test_formatter_build_get_roundtrip(app):
    mapping = [{"from": "title", "to": "name"}]
    status, built = call(
        app, "POST", "/api/formatters/build",
        {"resource": "job", "origin": "a", "target": "b", "mapping": mapping},
    )
    assert status == 200 and built["mapping"] == mapping
    status, got = call(app, "GET", f"/api/formatters/{built['formatter_id']}")
    assert status == 200 and got["mapping"] == mapping
    status, _ = call(app, "GET", "/api/formatters/missing-id")
    assert status == 404


def test_run_pull_dry_run(app, jobs_connector):
    status, body = call(
        app, "POST", "/api/run/pull",
        {
            "resource": "job",
            "origin": jobs_connector,
            "cursor": {"mode": "updated_at", "start": "2024-01-15 00:00:00"},
            "where": [{"field": "status", "op": "eq", "value": "open"}],
            "mapping": [
                {"from": "uid", "to": "job_id"},
                {"from": "title", "to": "name"},
            ],
            "uid_col": "uid",
            "dry_run": True,
        },
    )
    assert status == 200
    assert body["rows"] == 1  # uid=2: open AND after the cursor start
    assert body["cursor"]["end"].startswith("2024-02-01")


def test_run_push_dry_run_metrics(app, jobs_connector):
    status, body = call(
        app, "POST", "/api/run/push",
        {
            "resource": "job",
            "origin": jobs_connector,
            "having": [{"field": "status", "op": "eq", "value": "open"}],
            "dry_run": True,
        },
    )
    assert status == 200
    assert body == {
        "total_resources": 3,
        "total_resources_pushed": 2,
        "skipped_having": 1,
    }


def test_debug_connector_params(app):
    register_connector(
        ConnectorMeta(
            name="api_rest",
            factory=lambda: RestConnector(
                options={
                    "job": {
                        "url": "http://backend/jobs",
                        "range_bindings": json.dumps(
                            {"updated_at": {"gte": "updated_at_min", "lte": "updated_at_max"}}
                        ),
                        "search_bindings": json.dumps(
                            {"title": {"search_field": "q", "value_join": " OR "}}
                        ),
                    }
                }
            ),
        )
    )
    status, body = call(
        app, "POST", "/api/debug/connector_params",
        {
            "connector": "api_rest",
            "resource": "job",
            "cursor": {"mode": "updated_at", "start": "2024-01-10", "end": "2024-02-01"},
            "where": [
                {"field": "status", "op": "eq", "value": "open"},
                {"field": "tags", "op": "in", "value": ["a", "b"]},
                {"field": "title", "op": "contains", "value": "python"},
            ],
        },
    )
    assert status == 200
    assert body["params"] == {
        "status": "open",
        "tags__in": "a,b",
        "q": "python",
        "updated_at_min": "2024-01-10",
        "updated_at_max": "2024-02-01",
    }
    # non-REST connector → 400 with explanation
    status, body = call(
        app, "POST", "/api/debug/connector_params", {"connector": "api_wh"}
    )
    assert status in (400, 404)


def test_auth_schema_endpoint(app, jobs_connector):
    """GET /api/schema/auth/{connector} (reference app/api.py:96-119):
    REST connectors expose their auth class's field descriptors; a
    table-backed connector (no auth) returns []; unknown -> 404."""
    register_connector(
        ConnectorMeta(
            name="auth_rest_wh",
            factory=lambda: RestConnector(
                options={
                    "job": {
                        "url": "http://backend.test/jobs",
                        "auth": json.dumps(
                            {
                                "auth_type": "api_key",
                                "header_name": "X-API-Key",
                                "api_key": "k",
                            }
                        ),
                    }
                }
            ),
        )
    )
    status, fields = call(app, "GET", "/api/schema/auth/auth_rest_wh")
    assert status == 200
    by_name = {f["name"]: f for f in fields}
    assert {"base_url", "header_name", "api_key"} <= set(by_name)
    assert by_name["api_key"]["required"] is True
    assert by_name["header_name"]["default"] == "X-API-Key"
    assert by_name["api_key"]["type"] == "str"

    # table connector: no auth -> empty descriptor list
    status, fields = call(app, "GET", f"/api/schema/auth/{jobs_connector}")
    assert (status, fields) == (200, [])

    status, _ = call(app, "GET", "/api/schema/auth/nope")
    assert status == 404


def test_json_routes_reject_cross_origin_posts(app, jobs_connector):
    """The JSON run endpoints execute real operations and must not be
    cross-site-POSTable either: an <form enctype=text/plain> can
    smuggle a JSON body (read_body never checks Content-Type), so the
    Origin check covers every POST route, not just the playground.
    Requests without Origin/Referer (CLI clients) still pass."""
    body = {"connector": "nope"}
    # no Origin header (curl/scripts): passes the guard, fails on content
    status, _ = call(app, "POST", "/api/debug/connector_params", body)
    assert status == 404 or status == 400
    # cross-site Origin: rejected before any handler runs
    raw = json.dumps(body).encode()
    environ = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": "/api/run/pull",
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(raw)),
        "wsgi.input": io.BytesIO(raw),
        "HTTP_HOST": "127.0.0.1:8000",
        "HTTP_ORIGIN": "http://evil.example",
    }
    captured = {}

    def start_response(status_line, headers):
        captured["status"] = int(status_line.split()[0])

    out = b"".join(app(environ, start_response)).decode()
    assert captured["status"] == 403 and "cross-origin" in out


def test_auth_schema_connector_shadowing_a_kind_name(app, spark):
    """A connector registered under a name that collides with an auth
    KIND ('token') must still serve ITS OWN auth descriptors — the
    kind fallback applies only to names that resolve to no connector."""
    register_connector(
        ConnectorMeta(
            name="token",
            factory=lambda: RestConnector(
                options={
                    "job": {
                        "url": "http://backend.test/jobs",
                        "auth": json.dumps(
                            {
                                "auth_type": "api_key",
                                "header_name": "X-Custom-Key",
                                "api_key": "k",
                            }
                        ),
                    }
                }
            ),
        )
    )
    try:
        status, fields = call(app, "GET", "/api/schema/auth/token")
        assert status == 200
        names = {f["name"] for f in fields}
        # ApiKeyAuth fields (the connector's), NOT TokenAuth's scheme/token
        assert "header_name" in names and "scheme" not in names
    finally:
        from hrtech_etl_spark.connectors import _CONNECTORS

        _CONNECTORS.pop("token", None)


def test_oauth1_schema_route_and_signature(app):
    """GET /api/schema/auth/oauth1 serves the auth KIND's descriptors
    directly (no connector registration needed), and OAuth1Auth.sign
    reproduces the canonical public RFC 5849 HMAC-SHA1 example
    signature bit-for-bit."""
    status, fields = call(app, "GET", "/api/schema/auth/oauth1")
    assert status == 200
    by_name = {f["name"]: f for f in fields}
    assert {
        "base_url",
        "client_key",
        "client_secret",
        "resource_owner_key",
        "resource_owner_secret",
    } <= set(by_name)
    assert by_name["client_secret"]["required"] is True
    # the test-injection hook is internal, never a form field
    assert "timestamp_nonce" not in by_name

    from hrtech_etl_spark.sources.auth import OAuth1Auth, build_auth

    auth = OAuth1Auth(
        client_key="xvz1evFS4wEEPTGEFPHBog",
        client_secret="kAcSOqF21Fu85e7zjz7ZN2U4ZRhfV3WpwPAoE3Z7kBw",
        resource_owner_key="370773112-GmHxMAgYyLbNEtIKZeRNFsMKPR9EyMZeS9weJAEb",
        resource_owner_secret="LswwdoUaIvS8ltyTt5jkRh4J50vUPVVHtR2YPi5kE",
        timestamp_nonce=lambda: (
            "1318622958",
            "kYjzVBB8Y0ZFabxSWbWovY3uYSQ2pTgmZeNu2VS4cg",
        ),
    )
    hdr = auth.sign(
        "POST",
        "https://api.twitter.com/1.1/statuses/update.json",
        {
            "status": "Hello Ladies + Gentlemen, a signed OAuth request!",
            "include_entities": "true",
        },
    )["Authorization"]
    assert hdr.startswith("OAuth ")
    assert 'oauth_signature="hCtSmYh%2BiHYCEqBWrE7C7hYmtUk%3D"' in hdr
    assert 'oauth_consumer_key="xvz1evFS4wEEPTGEFPHBog"' in hdr
    assert 'oauth_signature_method="HMAC-SHA1"' in hdr
    # signing is request-bound -> the static header set stays empty,
    # and the payload factory dispatches on the new kind
    assert auth.as_headers() == {}
    assert isinstance(build_auth({"auth_type": "oauth1"}), OAuth1Auth)


def call_html(app, method, path, form=None, headers=None):
    from urllib.parse import urlencode

    raw = urlencode(form or {}).encode()
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(raw)),
        "CONTENT_TYPE": "application/x-www-form-urlencoded",
        "wsgi.input": io.BytesIO(raw),
    }
    for k, v in (headers or {}).items():
        environ["HTTP_" + k.upper().replace("-", "_")] = v
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])
        captured["headers"] = dict(headers)

    chunks = app(environ, start_response)
    return captured["status"], b"".join(chunks).decode()


def _csrf_token(app):
    """The playground embeds a per-app CSRF token as a hidden field;
    fetch the form like a browser would and extract it."""
    import re as _re

    _, page = call_html(app, "GET", "/playground")
    m = _re.search(r'name="csrf_token" value="([0-9a-f]+)"', page)
    assert m, "playground form must embed a csrf token"
    return m.group(1)


def test_playground_form_renders(app, jobs_connector):
    status, page = call_html(app, "GET", "/playground")
    assert status == 200
    assert "<form" in page and jobs_connector in page
    assert "cursor_start" in page and "mapping_from_0" in page
    assert 'name="csrf_token"' in page


def test_playground_runs_dry_pull(app, jobs_connector):
    status, page = call_html(
        app,
        "POST",
        "/playground",
        {
            "action": "run",
            "operation": "pull",
            "resource": "job",
            "origin": jobs_connector,
            "uid_col": "uid",
            "cursor_mode": "updated_at",
            "cursor_start": "2024-01-15 00:00:00",
            "cursor_sort_by": "asc",
            "filter_field_0": "status",
            "filter_op_0": "eq",
            "filter_value_0": "open",
            "dry_run": "on",
            "csrf_token": _csrf_token(app),
        },
    )
    assert status == 200
    assert "Result" in page and "cursor" in page
    # form state preserved after submit
    assert "2024-01-15 00:00:00" in page


def test_playground_shows_error_inline(app):
    status, page = call_html(
        app,
        "POST",
        "/playground",
        {
            "action": "run",
            "operation": "pull",
            "resource": "job",
            "origin": "nope",
            "csrf_token": _csrf_token(app),
        },
    )
    assert status == 200 and "Error:" in page


def test_playground_rejects_cross_site_posts(app, jobs_connector, monkeypatch):
    """The playground POST runs real pull/push operations, so it must
    not be cross-site-POSTable: a missing/wrong CSRF token or a
    mismatched Origin re-renders the form with an error and does NOT
    execute the operation."""
    import hrtech_etl_spark.app.api as api_mod

    ran = []
    monkeypatch.setattr(
        api_mod, "ep_run_pull", lambda *a, **k: ran.append("pull") or {}
    )
    body = {
        "action": "run",
        "operation": "pull",
        "resource": "job",
        "origin": jobs_connector,
        "dry_run": "on",
    }
    # no token at all
    status, page = call_html(app, "POST", "/playground", body)
    assert status == 200 and "CSRF" in page and ran == []
    # wrong token
    status, page = call_html(
        app, "POST", "/playground", {**body, "csrf_token": "deadbeef"}
    )
    assert status == 200 and "CSRF" in page and ran == []
    # right token but cross-site Origin
    token = _csrf_token(app)
    status, page = call_html(
        app,
        "POST",
        "/playground",
        {**body, "csrf_token": token},
        headers={"Host": "127.0.0.1:8000", "Origin": "http://evil.example"},
    )
    assert status == 200 and "cross-origin" in page and ran == []
    # right token, same-origin -> runs
    status, page = call_html(
        app,
        "POST",
        "/playground",
        {**body, "csrf_token": token},
        headers={"Host": "127.0.0.1:8000", "Origin": "http://127.0.0.1:8000"},
    )
    assert status == 200 and ran == ["pull"]
