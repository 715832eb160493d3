"""Mapping-spec → select-plan compiler + formatter registry.

The reference's formatter surface is (a) mapping specs
``[{"from": src, "to": dst}]`` compiled into per-row callables
(``formatters/base.py:39-80``) stored in a registry keyed by id
(``formatters/base.py:14-23``, ``app/api.py:166-214``), and (b)
arbitrary Python callables applied per record (``core/utils.py:51-64``).

Spark-first re-expression:

- A mapping spec compiles to a **column projection** —
  ``df.select(col(src).alias(dst), ...)`` — which stays entirely inside
  Catalyst (column pruning reaches the parquet scan, no Python in the
  hot path). Dotted ``from`` paths resolve nested struct fields.
- Opaque Python formatters are the fenced slow path: a pandas UDF /
  ``mapInPandas`` wrapper (Arrow-batched, never row-at-a-time) — see
  :func:`pandas_formatter`.
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterable, Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MappingSpec = Sequence[Mapping[str, str]]

# Registry of named mapping specs (the reference rebuilds callables from
# FORMATTER_REGISTRY at run time — app/api.py:225-321).
FORMATTER_REGISTRY: dict[str, MappingSpec] = {}


def register_formatter(mapping: MappingSpec, formatter_id: str | None = None) -> str:
    fid = formatter_id or str(uuid.uuid4())
    FORMATTER_REGISTRY[fid] = list(mapping)
    return fid


def build_mapping_projection(mapping: MappingSpec) -> list[Column]:
    """Compile ``[{"from": src, "to": dst}]`` into aliased Columns.

    Missing source columns surface as an AnalysisException at plan time
    (the reference silently yields ``None`` via ``getattr(obj, src,
    None)`` — formatters/base.py:77; we prefer failing loudly, callers
    can pass ``lit(None)`` mappings explicitly).
    """
    return [F.col(m["from"]).alias(m["to"]) for m in mapping]


def apply_mapping(df: DataFrame, mapping: MappingSpec) -> DataFrame:
    return df.select(*build_mapping_projection(mapping))


def apply_registered(df: DataFrame, formatter_id: str) -> DataFrame:
    return apply_mapping(df, FORMATTER_REGISTRY[formatter_id])


def pandas_formatter(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType,
) -> Callable[[DataFrame], DataFrame]:
    """Fence an opaque per-batch Python transform behind mapInPandas.

    ``fn`` receives/returns pandas DataFrames (Arrow-batched). Use only
    when the transform is not expressible as a column projection.
    """

    def _iterate(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield fn(batch)

    def _apply(df: DataFrame) -> DataFrame:
        return df.mapInPandas(_iterate, schema=schema)

    return _apply
