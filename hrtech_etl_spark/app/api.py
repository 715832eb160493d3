"""Minimal HTTP facade mirroring the reference's FastAPI surface
(``app/api.py:35-386``) over the engine's pure functions — stdlib WSGI
only (FastAPI is not in this environment, and the facade adds no query
capability: every endpoint is a thin JSON shim over ``pipeline``,
``connectors``, ``plans.mapping`` and ``sources.rest``).

Routes (all under ``/api``):

- ``GET  /health``
- ``GET  /connectors``                      ≙ reference ``/connectors``
- ``GET  /schema/unified/{resource}``       ≙ ``/schema/unified/...``
- ``GET  /schema/{connector}/{resource}``   ≙ ``/schema/{c}/{r}``
  (``?only_prefilterable=true`` filters to pushdown-capable fields)
- ``GET  /schema/auth/{connector}``         ≙ ``/schema/auth/{c}``
  (``app/api.py:96-119``): auth field descriptors for dynamic UI forms
- ``POST /formatters/build`` / ``GET /formatters/{id}``
  ≙ mapping-formatter registry (``app/api.py:166-214``)
- ``POST /run/pull`` / ``POST /run/push``   ≙ ``/run/pull|push``
- ``POST /debug/connector_params``          ≙ ``/debug/connector_params``
  (``app/api.py:343-386``): shows how EQ/IN/CONTAINS conditions and the
  cursor translate into backend query params via the same
  ``compile_pushed_params`` the REST reader executes.
- ``GET|POST /playground``                  ≙ ``/playground``
  (``app/playground.py:316-521``): the form-driven pull/push runner,
  rendered by :mod:`hrtech_etl_spark.app.playground`.

The Spark-facing endpoints acquire the session lazily via
``spark_factory`` (default :func:`hrtech_etl_spark.core.session.
get_spark`); metadata endpoints never touch Spark.
"""

from __future__ import annotations

import json
import re
from dataclasses import asdict
from typing import Any, Callable, Optional
from urllib.parse import parse_qs

from hrtech_etl_spark.connectors import (
    RestConnector,
    get_connector_instance,
    list_connectors,
)
from hrtech_etl_spark.core.schemas import (
    UNIFIED_JOB_SCHEMA,
    UNIFIED_PROFILE_SCHEMA,
    export_schema_fields,
)
from hrtech_etl_spark.core.state import CursorStore, resume_cursor
from hrtech_etl_spark.core.types import Condition, Cursor, Resource, SortOrder
from hrtech_etl_spark.plans.mapping import FORMATTER_REGISTRY, register_formatter

_UNIFIED = {"job": UNIFIED_JOB_SCHEMA, "profile": UNIFIED_PROFILE_SCHEMA}


class ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _conditions(raw: Optional[list]) -> list[Condition]:
    return [Condition(c["field"], c["op"], c.get("value")) for c in raw or []]


def _cursor(raw: Optional[dict]) -> Cursor:
    raw = raw or {}
    return Cursor(
        mode=raw.get("mode", "updated_at"),
        start=raw.get("start"),
        end=raw.get("end"),
        sort_by=raw.get("sort_by", "asc"),
        start_uid=raw.get("start_uid"),
        end_uid=raw.get("end_uid"),
    )


def _cursor_dict(cursor: Cursor) -> dict:
    d = asdict(cursor)
    d["mode"] = cursor.mode.value
    d["sort_by"] = cursor.sort_by.value
    return {k: (v if v is None or isinstance(v, (int, float, bool)) else str(v)) for k, v in d.items()}


def _resolve_mapping(body: dict):
    if body.get("formatter_id"):
        fid = body["formatter_id"]
        if fid not in FORMATTER_REGISTRY:
            raise ApiError(404, f"Formatter not found: {fid}")
        return FORMATTER_REGISTRY[fid]
    if body.get("mapping"):
        return [{"from": m["from"], "to": m["to"]} for m in body["mapping"]]
    return None


def _connector(name: str):
    try:
        return get_connector_instance(name)
    except KeyError as exc:
        raise ApiError(404, str(exc)) from exc


# ---------------------------------------------------------------------------
# Endpoint implementations (pure JSON-in/JSON-out functions)
# ---------------------------------------------------------------------------

def ep_connectors() -> list[dict]:
    return [
        {
            "name": m.name,
            "warehouse_type": m.warehouse_type,
            "description": m.description,
        }
        for m in list_connectors().values()
    ]


def ep_schema(spark_factory, connector: str, resource: str, only_prefilterable: bool) -> list[dict]:
    if resource not in ("job", "profile"):
        raise ApiError(400, f"resource must be job|profile, got {resource!r}")
    if connector == "unified":
        fields = export_schema_fields(_UNIFIED[resource])
    else:
        conn = _connector(connector)
        df = conn.read_resource(spark_factory(), Resource(resource))
        fields = export_schema_fields(df.schema)
    if only_prefilterable:
        fields = [f for f in fields if f["prefilter_operators"]]
    return fields


def ep_auth_schema(connector: str) -> list[dict]:
    """Auth-field introspection for dynamic UI forms (reference
    ``app/api.py:96-119`` via ``core/ui_schema.py:107-180``): resolve
    the connector and export its auth class's fields (a connector
    without auth — table-backed, or none declared — returns an empty
    list); a name that matches no connector but IS an auth kind
    (``oauth1``, ``bearer``, ...) serves that kind's descriptors
    directly. Connector resolution comes FIRST so a connector that
    happens to be named like a kind (e.g. 'token') still introspects
    its own auth, not the generic kind."""
    from hrtech_etl_spark.sources.auth import AUTH_KINDS, export_auth_fields

    try:
        conn = _connector(connector)
    except ApiError:
        if connector in AUTH_KINDS:
            return export_auth_fields(AUTH_KINDS[connector])
        raise
    auth = getattr(conn, "auth", None)
    if auth is None:
        return []
    return export_auth_fields(auth)


def ep_playground(
    spark_factory,
    method: str,
    form: dict,
    *,
    csrf_token: str | None = None,
    origin_ok: bool = True,
) -> str:
    """The form-driven playground page (reference
    ``app/playground.py:316-521``): GET renders the blank form, POST
    parses it into the same body ``ep_run_pull``/``ep_run_push`` take,
    runs the operation, and re-renders the form with the result (or
    error) and the submitted values preserved.

    The POST executes REAL pull/push operations from a plain form, so
    it is CSRF-guarded: the run only happens when the submitted
    ``csrf_token`` matches the app instance's token (embedded in the
    rendered form — unknowable to a cross-site page) AND the request's
    Origin/Referer matched the Host (``origin_ok``, checked by the
    WSGI layer). A rejected post re-renders the form with an error
    instead of running."""
    from hrtech_etl_spark.app import playground as pg
    from hrtech_etl_spark.sources.auth import export_auth_fields

    connectors = sorted(list_connectors())
    auth_fields = {}
    for name in connectors:
        try:
            auth = getattr(get_connector_instance(name), "auth", None)
        except Exception:  # noqa: BLE001 — metadata best-effort only
            auth = None
        if auth is not None:
            auth_fields[name] = export_auth_fields(auth)

    result = error = None
    if method == "POST" and (form.get("action") or [""])[-1] == "run":
        import secrets as _secrets

        submitted = (form.get("csrf_token") or [""])[-1]
        if not origin_ok:
            error = "cross-origin form post rejected"
        elif csrf_token is not None and not _secrets.compare_digest(
            submitted, csrf_token
        ):
            error = "invalid or missing CSRF token — reload the form"
        else:
            body = pg.parse_body(form)
            try:
                if body["operation"] == "push":
                    result = ep_run_push(spark_factory, body)
                else:
                    result = ep_run_pull(spark_factory, body)
            except ApiError as exc:
                error = exc.detail
            except Exception as exc:  # noqa: BLE001 — page shows the failure
                error = f"{type(exc).__name__}: {exc}"
    return pg.render(
        connectors,
        state=form if method == "POST" else None,
        result=result,
        error=error,
        auth_fields=auth_fields,
        csrf_token=csrf_token,
    )


def ep_build_formatter(body: dict) -> dict:
    mapping = [{"from": m["from"], "to": m["to"]} for m in body["mapping"]]
    fid = register_formatter(mapping)
    return {
        "formatter_id": fid,
        "resource": body.get("resource"),
        "origin": body.get("origin"),
        "target": body.get("target"),
        "mapping": mapping,
    }


def ep_get_formatter(fid: str) -> dict:
    if fid not in FORMATTER_REGISTRY:
        raise ApiError(404, "Formatter not found")
    return {"formatter_id": fid, "mapping": list(FORMATTER_REGISTRY[fid])}


def ep_run_pull(spark_factory, body: dict) -> dict:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hrtech_etl_spark import pipeline as pl

    spark = spark_factory()
    resource = Resource(body["resource"])
    source = _connector(body["origin"]).read_resource(spark, resource)
    store = CursorStore(body["state_dir"]) if body.get("state_dir") else None
    key = body.get("pipeline_key", "default")
    cursor = resume_cursor(store, key, _cursor(body.get("cursor")))
    result = pl.pull(
        source,
        cursor=cursor,
        cursor_col=body.get("cursor_col") or cursor.mode.value,
        uid_col=body.get("uid_col", "uid"),
        where=_conditions(body.get("where")),
        having=_conditions(body.get("having")),
        mapping=_resolve_mapping(body),
        dry_run=bool(body.get("dry_run")),
    )
    rows = result.rows if result.rows >= 0 else None
    if body.get("target") and not body.get("dry_run"):
        # count rides the write pass as an Observation — no extra job
        obs = Observation()
        observed = result.dataframe.observe(obs, F.count(F.lit(1)).alias("n"))
        _connector(body["target"]).write_resource(observed, resource)
        rows = int(obs.get["n"])
    if store:
        store.save(key, result.cursor)
    return {"cursor": _cursor_dict(result.cursor), "rows": rows}


def ep_run_push(spark_factory, body: dict) -> dict:
    from hrtech_etl_spark import pipeline as pl

    spark = spark_factory()
    resource = Resource(body["resource"])
    source = _connector(body["origin"]).read_resource(spark, resource)
    target = _connector(body["target"]) if body.get("target") else None
    return pl.push_resources(
        source,
        having=_conditions(body.get("having")),
        mapping=_resolve_mapping(body),
        sink_writer=(
            (lambda out: target.write_resource(out, resource)) if target else None
        ),
        dry_run=bool(body.get("dry_run")),
    )


def ep_debug_connector_params(body: dict) -> dict:
    from hrtech_etl_spark.sources.rest import RestConfig, compile_pushed_params

    conn = _connector(body["connector"])
    resource = body.get("resource", "job")
    if not isinstance(conn, RestConnector):
        raise ApiError(400, "connector_params debug requires a REST connector")
    try:
        cfg = RestConfig.from_options(dict(conn.options[resource]))
    except KeyError as exc:
        raise ApiError(400, f"connector has no {resource!r} options") from exc

    pushed: list[tuple] = []
    for c in _conditions(body.get("where")):
        pushed.append((c.field, c.op.value, c.value))
    cursor = _cursor(body.get("cursor"))
    sort_by_unified = body.get("sort_by_unified") or cursor.mode.value
    asc = cursor.sort_by is SortOrder.ASC
    if cursor.start is not None:
        pushed.append((sort_by_unified, "gte" if asc else "lte", cursor.start))
    if cursor.end is not None:
        pushed.append((sort_by_unified, "lte" if asc else "gte", cursor.end))
    try:
        params = compile_pushed_params(pushed, cfg)
    except KeyError as exc:
        raise ApiError(
            400, f"no binding for pushed field {exc} in connector options"
        ) from exc
    return {
        "connector": body["connector"],
        "resource": resource,
        "sort_by_unified": sort_by_unified,
        "params": params,
        "pushed": [list(p) for p in pushed],
    }


# ---------------------------------------------------------------------------
# WSGI plumbing
# ---------------------------------------------------------------------------

def _same_origin(environ: dict) -> bool:
    """True when the request's Origin (or, failing that, Referer) host
    matches the Host header — or when neither header is present (CLI
    clients). Cross-site form posts from a browser always carry an
    Origin, so a mismatch (or Origin: null) is rejected."""
    from urllib.parse import urlsplit

    host = environ.get("HTTP_HOST") or ""
    for hdr in ("HTTP_ORIGIN", "HTTP_REFERER"):
        v = environ.get(hdr)
        if v:
            return urlsplit(v).netloc == host
    return True


def create_app(spark_factory: Callable[[], Any] | None = None):
    """Build the WSGI application. ``spark_factory`` defaults to the
    shared session builder; inject a fake in tests."""
    import secrets

    if spark_factory is None:

        def spark_factory():  # pragma: no cover - default wiring
            from hrtech_etl_spark.core.session import get_spark

            return get_spark(app_name="hrtech-etl-spark-api")

    # per-app-instance CSRF token for the playground form. The JSON
    # routes are origin-checked too: a cross-site page can smuggle a
    # JSON body through an <form enctype="text/plain"> post (read_body
    # never looks at Content-Type), so "it takes JSON" is NOT
    # cross-site protection by itself.
    csrf_token = secrets.token_hex(16)

    def app(environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "")
        query = environ.get("QUERY_STRING", "")

        def respond(status: int, payload):
            body = json.dumps(payload, default=str).encode()
            start_response(
                f"{status} {'OK' if status < 400 else 'ERROR'}",
                [
                    ("Content-Type", "application/json"),
                    ("Content-Length", str(len(body))),
                ],
            )
            return [body]

        def read_body() -> dict:
            try:
                length = int(environ.get("CONTENT_LENGTH") or 0)
            except ValueError:
                length = 0
            raw = environ["wsgi.input"].read(length) if length else b"{}"
            try:
                return json.loads(raw or b"{}")
            except json.JSONDecodeError as exc:
                raise ApiError(400, f"invalid JSON body: {exc}") from exc

        def respond_html(markup: str):
            body = markup.encode()
            start_response(
                "200 OK",
                [
                    ("Content-Type", "text/html; charset=utf-8"),
                    ("Content-Length", str(len(body))),
                ],
            )
            return [body]

        try:
            if path == "/playground" and method in ("GET", "POST"):
                form: dict = {}
                origin_ok = True
                if method == "POST":
                    try:
                        length = int(environ.get("CONTENT_LENGTH") or 0)
                    except ValueError:
                        length = 0
                    raw = environ["wsgi.input"].read(length) if length else b""
                    form = parse_qs(raw.decode())
                    origin_ok = _same_origin(environ)
                return respond_html(
                    ep_playground(
                        spark_factory,
                        method,
                        form,
                        csrf_token=csrf_token,
                        origin_ok=origin_ok,
                    )
                )
            if method == "POST" and not _same_origin(environ):
                # browsers always attach Origin to cross-site POSTs;
                # CLI/script clients send neither Origin nor Referer
                # and pass — same policy as the playground form.
                return respond(403, {"detail": "cross-origin POST rejected"})
            if method == "GET" and path == "/api/health":
                return respond(200, {"status": "ok"})
            if method == "GET" and path == "/api/connectors":
                return respond(200, ep_connectors())
            # auth route first: it shares the /api/schema/{a}/{b} shape
            m = re.match(r"^/api/schema/auth/(?P<connector>[^/]+)$", path)
            if method == "GET" and m:
                return respond(200, ep_auth_schema(m["connector"]))
            m = re.match(r"^/api/schema/(?P<connector>[^/]+)/(?P<resource>[^/]+)$", path)
            if method == "GET" and m:
                params = parse_qs(query)
                only_pref = params.get("only_prefilterable", ["false"])[
                    -1
                ].lower() in ("true", "1", "yes")
                return respond(
                    200,
                    ep_schema(spark_factory, m["connector"], m["resource"], only_pref),
                )
            if method == "POST" and path == "/api/formatters/build":
                return respond(200, ep_build_formatter(read_body()))
            m = re.match(r"^/api/formatters/(?P<fid>[^/]+)$", path)
            if method == "GET" and m:
                return respond(200, ep_get_formatter(m["fid"]))
            if method == "POST" and path == "/api/run/pull":
                return respond(200, ep_run_pull(spark_factory, read_body()))
            if method == "POST" and path == "/api/run/push":
                return respond(200, ep_run_push(spark_factory, read_body()))
            if method == "POST" and path == "/api/debug/connector_params":
                return respond(200, ep_debug_connector_params(read_body()))
            return respond(404, {"detail": f"no route {method} {path}"})
        except ApiError as exc:
            return respond(exc.status, {"detail": exc.detail})
        except (KeyError, ValueError, TypeError) as exc:
            return respond(400, {"detail": f"{type(exc).__name__}: {exc}"})

    return app


def serve(host: str = "127.0.0.1", port: int = 8000, spark_factory=None):  # pragma: no cover
    """Run the facade on stdlib wsgiref (dev/debug server, matching the
    reference's uvicorn entry point in capability)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, create_app(spark_factory)) as httpd:
        print(f"hrtech-etl-spark api on http://{host}:{port}/api/health")
        httpd.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    serve()
