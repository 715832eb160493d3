"""REST connector as a PySpark Python DataSource (V2) with partial
filter pushdown and paginated reads.

This is the Spark-native re-expression of the reference's connector
edge: its per-connector ``read_*_batch`` methods compile a ``Condition``
list + ``Cursor`` into HTTP query params and page through the backend
(``core/connector.py:209-255``, ``core/utils.py:604-652``). Here the
same compilation happens inside Spark's planner/executor contract:

- ``pushFilters`` receives Catalyst's conjunctive filter list and
  accepts exactly what the backend can evaluate, per a declarative
  per-field capability map (the reference's ``prefilter.operators`` /
  ``in_binding`` / ``search_binding`` / cursor-range metadata,
  ``core/models.py:167-250``). Everything else is RETURNED to Spark
  and re-applied as a residual filter — fixing the reference's
  silent-drop defect (``core/utils.py:309-311``; SURVEY.md §4.1).
  CONTAINS is pushed *and* returned: backend search is treated as a
  recall-improving prefilter, Spark re-verifies exact substring
  semantics.
- ``partitions`` parallelizes offset-paginated backends: N partitions
  each walk offsets ``p·page, p·page + N·page, …`` so a 1000-executor
  cluster fans the scan out without coordination. Cursor-chained
  backends are inherently sequential → one partition (scale there
  comes from running many resources/endpoints concurrently).
- Reads run on executors; auth (api_key/bearer/token/oauth2/login)
  builds headers per worker via :mod:`hrtech_etl_spark.sources.auth`.

Param encodings mirror the reference exactly: EQ → ``field=value``
(``core/utils.py:291-316``); IN → ``{field}__in`` with csv/json/repeat
encodings (``core/utils.py:482-601``); range ops → named min/max params
(``core/utils.py:195-286``); CONTAINS → composed boolean search string,
per-field values joined by ``value_join``, field blocks joined by
``" AND "`` (``core/utils.py:354-474``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from datetime import date, datetime
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringContains,
)
from pyspark.sql import types as T

from hrtech_etl_spark.sources.auth import BaseAuth, build_auth

_FILTER_OPS = {
    EqualTo: "eq",
    # x <=> v with a non-null literal is plain equality; the engine's
    # Condition compiler emits eqNullSafe, so Catalyst hands us this
    # class. A null literal means IS NULL -> stays residual.
    EqualNullSafe: "eq",
    In: "in",
    GreaterThan: "gt",
    GreaterThanOrEqual: "gte",
    LessThan: "lt",
    LessThanOrEqual: "lte",
    StringContains: "contains",
}


@dataclass
class RestConfig:
    """Parsed, picklable view of the DataSource options."""

    url: str
    data_path: str = "data"
    pagination: str = "offset"  # offset | cursor | none
    page_size: int = 1000
    limit_param: str = "limit"
    offset_param: str = "offset"
    num_partitions: int = 4
    cursor_param: str = "cursor"
    next_cursor_field: str = "next"
    max_pages: int = 10000
    max_retries: int = 3
    retry_backoff_s: float = 0.5
    pushable: Dict[str, List[str]] = dc_field(default_factory=dict)
    in_param_suffix: str = "__in"
    in_encoding: str = "csv"  # csv | json | repeat
    range_bindings: Dict[str, Dict[str, str]] = dc_field(default_factory=dict)
    search_bindings: Dict[str, Dict[str, str]] = dc_field(default_factory=dict)
    static_params: Dict[str, Any] = dc_field(default_factory=dict)
    auth_payload: Optional[Dict[str, Any]] = None

    @classmethod
    def from_options(cls, options: Dict[str, str]) -> "RestConfig":
        def j(key: str, default):
            raw = options.get(key)
            return json.loads(raw) if raw else default

        return cls(
            url=options["url"],
            data_path=options.get("data_path", "data"),
            pagination=options.get("pagination", "offset"),
            page_size=int(options.get("page_size", 1000)),
            limit_param=options.get("limit_param", "limit"),
            offset_param=options.get("offset_param", "offset"),
            num_partitions=int(options.get("num_partitions", 4)),
            cursor_param=options.get("cursor_param", "cursor"),
            next_cursor_field=options.get("next_cursor_field", "next"),
            max_pages=int(options.get("max_pages", 10000)),
            max_retries=int(options.get("max_retries", 3)),
            retry_backoff_s=float(options.get("retry_backoff_s", 0.5)),
            pushable=j("pushable", {}),
            in_param_suffix=options.get("in_param_suffix", "__in"),
            in_encoding=options.get("in_encoding", "csv"),
            range_bindings=j("range_bindings", {}),
            search_bindings=j("search_bindings", {}),
            static_params=j("params", {}),
            auth_payload=j("auth", None),
        )


def compile_pushed_params(
    pushed: Sequence[Tuple[str, str, Any]], cfg: RestConfig
) -> Dict[str, Any]:
    """(field, op, value) triples → backend query params. Pure function
    so the debug surface (the reference's ``/api/debug/connector_params``,
    ``app/api.py:343-386``) and the reader share one implementation."""
    params: Dict[str, Any] = {}
    search_blocks: Dict[str, List[str]] = {}  # search_field -> field blocks
    for fld, op, value in pushed:
        if op == "eq":
            params[fld] = value
        elif op == "in":
            key = fld + cfg.in_param_suffix
            vals = list(value)
            if cfg.in_encoding == "csv":
                params[key] = ",".join(str(v) for v in vals)
            elif cfg.in_encoding == "json":
                params[key] = json.dumps([str(v) for v in vals])
            else:  # repeat: the HTTP layer repeats the key per value
                params[key] = [str(v) for v in vals]
        elif op in ("gt", "gte", "lt", "lte"):
            params[cfg.range_bindings[fld][op]] = value
        elif op == "contains":
            binding = cfg.search_bindings[fld]
            sf = binding["search_field"]
            join = binding.get("value_join", " OR ")
            block = str(value) if isinstance(value, str) else join.join(
                str(v) for v in value
            )
            search_blocks.setdefault(sf, []).append(block)
    for sf, blocks in search_blocks.items():
        params[sf] = " AND ".join(
            f"({b})" if len(blocks) > 1 else b for b in blocks
        )
    return params


def _converter(dtype: T.DataType):
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return lambda v: None if v is None else int(v)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return lambda v: None if v is None else float(v)
    if isinstance(dtype, T.BooleanType):
        return lambda v: None if v is None else bool(v)
    if isinstance(dtype, T.TimestampType):
        return lambda v: (
            None
            if v is None
            else (
                datetime.fromisoformat(str(v).replace("Z", "+00:00"))
                if not isinstance(v, datetime)
                else v
            )
        )
    if isinstance(dtype, T.DateType):
        return lambda v: None if v is None else date.fromisoformat(str(v))
    if isinstance(dtype, T.StringType):
        return lambda v: None if v is None else str(v)
    return lambda v: v


@dataclass
class _PagePartition(InputPartition):
    index: int = 0


class RestDataSourceReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: Dict[str, str]):
        self.schema_ = schema
        self.cfg = RestConfig.from_options(options)
        self.pushed: List[Tuple[str, str, Any]] = []

    # -- planner side ------------------------------------------------------

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            op = _FILTER_OPS.get(type(f))
            fld = (
                f.attribute[0]
                if op is not None and len(f.attribute) == 1
                else None
            )
            ok = (
                op is not None
                and fld is not None
                and op in self.cfg.pushable.get(fld, [])
            )
            if ok and isinstance(f, EqualNullSafe) and f.value is None:
                ok = False  # x <=> NULL is IS NULL — not expressible as a param
            # structural requirements beyond the op whitelist
            if ok and op in ("gt", "gte", "lt", "lte"):
                ok = op in self.cfg.range_bindings.get(fld, {})
            if ok and op == "contains":
                ok = "search_field" in self.cfg.search_bindings.get(fld, {})
            if ok:
                value = list(f.value) if op == "in" else f.value
                self.pushed.append((fld, op, value))
                if op == "contains":
                    # backend search is recall-oriented; Spark re-verifies
                    # exact substring semantics (defect fix, SURVEY §4.1)
                    yield f
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        if self.cfg.pagination == "offset":
            return [_PagePartition(i) for i in range(self.cfg.num_partitions)]
        return [_PagePartition(0)]

    # -- executor side -----------------------------------------------------

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        import requests

        cfg = self.cfg
        auth: BaseAuth = build_auth(cfg.auth_payload, base_url="")
        headers = auth.build_headers()
        # request-bound schemes (OAuth1) sign method+URL+params: a
        # static header can't exist, so re-sign per request instead
        signer = getattr(auth, "sign", None)
        fields = self.schema_.fields
        convs = [(f.name, _converter(f.dataType)) for f in fields]

        base_params: Dict[str, Any] = dict(cfg.static_params)
        base_params.update(compile_pushed_params(self.pushed, cfg))
        base_params[cfg.limit_param] = cfg.page_size

        session = requests.Session()

        def fetch(params: Dict[str, Any]) -> Dict[str, Any]:
            # Bounded retry with exponential backoff: at fan-out scale
            # transient 5xx/connection failures are routine; 4xx are
            # caller bugs and fail fast. Page requests are idempotent
            # GETs, so retrying cannot duplicate rows.
            import time

            attempt = 0
            while True:
                req_headers = headers
                if signer is not None:
                    # re-sign EVERY attempt: OAuth1 servers enforce
                    # nonce uniqueness, so replaying the previous
                    # attempt's nonce/timestamp on a retry would 401
                    req_headers = dict(headers)
                    req_headers.update(signer("GET", cfg.url, params))
                try:
                    resp = session.get(
                        cfg.url, params=params, headers=req_headers, timeout=60
                    )
                    if resp.status_code >= 500:
                        resp.raise_for_status()
                    resp.raise_for_status()
                    break
                except (
                    requests.ConnectionError,
                    requests.Timeout,
                    requests.HTTPError,
                ) as exc:
                    status = getattr(getattr(exc, "response", None), "status_code", None)
                    retryable = status is None or status >= 500
                    if not retryable or attempt >= cfg.max_retries:
                        raise
                    time.sleep(cfg.retry_backoff_s * (2**attempt))
                    attempt += 1
            body = resp.json()
            if isinstance(body, list):
                return {cfg.data_path: body}
            return body

        def emit(rows: List[dict]) -> Iterator[tuple]:
            for r in rows:
                yield tuple(conv(r.get(name)) for name, conv in convs)

        if cfg.pagination == "offset":
            stride = cfg.num_partitions * cfg.page_size
            offset = partition.index * cfg.page_size
            for _ in range(cfg.max_pages):
                params = dict(base_params)
                params[cfg.offset_param] = offset
                rows = fetch(params).get(cfg.data_path) or []
                yield from emit(rows)
                if len(rows) < cfg.page_size:
                    break
                offset += stride
        elif cfg.pagination == "cursor":
            cursor_tok: Optional[str] = None
            for _ in range(cfg.max_pages):
                params = dict(base_params)
                if cursor_tok is not None:
                    params[cfg.cursor_param] = cursor_tok
                body = fetch(params)
                rows = body.get(cfg.data_path) or []
                yield from emit(rows)
                cursor_tok = body.get(cfg.next_cursor_field)
                if not cursor_tok or not rows:
                    break
        else:  # single page
            rows = fetch(dict(base_params)).get(cfg.data_path) or []
            yield from emit(rows)


class RestDataSource(DataSource):
    """``spark.read.format("hrtech_rest")`` — see module docstring.

    Required options: ``url`` and either a reader-supplied ``.schema``
    or a ``schema`` option holding the DDL string.
    """

    @classmethod
    def name(cls) -> str:
        return "hrtech_rest"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "hrtech_rest requires .schema(...) or a 'schema' option (DDL)"
            )
        return ddl

    def reader(self, schema: T.StructType) -> RestDataSourceReader:
        return RestDataSourceReader(schema, dict(self.options))


def register(spark) -> None:
    """Register the REST source on a session (idempotent)."""
    spark.dataSource.register(RestDataSource)
