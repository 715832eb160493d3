"""Connector registry: named origin/target warehouses.

Mirrors the reference's registry (``core/registry.py:10-54``:
``ConnectorMeta`` + ``register_connector`` / ``get_connector_instance``
global dicts) over Spark-native connector instances:

- :class:`TableConnector` — file/table-backed warehouse (parquet/JSON/
  CSV/Delta root with one dataset per resource). The 100 TB workhorse.
- :class:`RestConnector` — REST-backed warehouse via the
  ``hrtech_rest`` DataSource (:mod:`hrtech_etl_spark.sources.rest`);
  reads push filters/pagination to the backend, writes are set-based
  merges into a staging table (per-row HTTP writes are the reference
  anti-pattern — SURVEY.md §6).

A connector exposes ``read_resource`` / ``write_resource`` per
``Resource`` — the Spark analog of the reference's
``read_*_batch`` / ``write_*_batch`` dispatch
(``core/connector.py:209-267``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from hrtech_etl_spark.core.types import Resource


class BaseConnector:
    def read_resource(self, spark: SparkSession, resource: Resource) -> DataFrame:
        raise NotImplementedError

    def write_resource(
        self, df: DataFrame, resource: Resource, mode: str = "append"
    ) -> None:
        raise NotImplementedError


@dataclass
class TableConnector(BaseConnector):
    """One dataset per resource under ``root`` (``{root}/{resource}s``
    by default, override per resource via ``paths``)."""

    root: str
    fmt: str = "parquet"
    paths: Dict[str, str] = field(default_factory=dict)

    def _path(self, resource: Resource) -> str:
        return self.paths.get(resource.value) or os.path.join(
            self.root, f"{resource.value}s"
        )

    def read_resource(self, spark: SparkSession, resource: Resource) -> DataFrame:
        return spark.read.format(self.fmt).load(self._path(resource))

    def write_resource(
        self, df: DataFrame, resource: Resource, mode: str = "append"
    ) -> None:
        df.write.format(self.fmt).mode(mode).save(self._path(resource))


@dataclass
class RestConnector(BaseConnector):
    """REST warehouse: per-resource reader options for the
    ``hrtech_rest`` source (url, schema DDL, pushable map, pagination,
    auth — see :mod:`hrtech_etl_spark.sources.rest`)."""

    options: Dict[str, Dict[str, str]]  # resource value -> reader options

    @property
    def auth(self):
        """The auth instance this connector's reader options declare
        (first resource carrying an ``auth`` payload), or None — the
        introspection hook behind ``GET /api/schema/auth/{connector}``
        (reference ``app/api.py:96-119`` reads ``connector.auth``)."""
        import json

        from hrtech_etl_spark.sources.auth import build_auth

        for opts in self.options.values():
            payload = opts.get("auth")
            if payload:
                if isinstance(payload, str):
                    payload = json.loads(payload)
                return build_auth(payload, base_url=opts.get("url", ""))
        return None

    def read_resource(self, spark: SparkSession, resource: Resource) -> DataFrame:
        from hrtech_etl_spark.sources import rest

        rest.register(spark)
        opts = dict(self.options[resource.value])
        schema = opts.pop("schema", None)
        reader = spark.read.format("hrtech_rest").options(**opts)
        if schema:
            reader = reader.schema(schema)
        return reader.load()

    def write_resource(
        self, df: DataFrame, resource: Resource, mode: str = "append"
    ) -> None:
        raise NotImplementedError(
            "REST writes are set-based merges into a staging table; "
            "point a TableConnector at the staging root instead"
        )


@dataclass
class ConnectorMeta:
    """Registry entry (reference ``core/registry.py:10-20``)."""

    name: str
    warehouse_type: str = "ats"
    description: str = ""
    factory: Optional[Callable[[], BaseConnector]] = None


_CONNECTORS: Dict[str, ConnectorMeta] = {}


def register_connector(meta: ConnectorMeta) -> None:
    _CONNECTORS[meta.name] = meta


def list_connectors() -> Dict[str, ConnectorMeta]:
    return dict(_CONNECTORS)


def get_connector_instance(name: str) -> BaseConnector:
    """Resolve a registered name to an instance; unregistered names
    that look like paths resolve to a parquet TableConnector (the CLI
    convenience path)."""
    meta = _CONNECTORS.get(name)
    if meta is not None and meta.factory is not None:
        return meta.factory()
    if os.path.sep in name or os.path.isdir(name):
        return TableConnector(root=name)
    raise KeyError(f"Unknown connector: {name!r}")
