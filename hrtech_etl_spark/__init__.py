"""hrtech_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
the Riminder/hrtech-etl reference (an HTTP/REST, Pydantic-row ETL
framework for HRTech data), re-expressed Spark-first:

- the reference's Condition/Cursor query algebra becomes a
  ``Column``-expression compiler over DataFrames (``core``),
- its pull/push pipelines become declarative DataFrame plans with
  checkpointed incremental cursors (``pipeline``),
- its event surface becomes Structured Streaming (``streaming``),
- and the 100TB-scale extension surface (joins, aggregations, windows,
  dedup, similarity search, text analysis, multimodal columns) lives in
  ``operators`` / ``functions``.

Everything is built on the public PySpark DataFrame/SQL API; physical
execution is delegated to Catalyst/Tungsten (broadcast joins, AQE,
whole-stage codegen, parquet predicate pushdown).
"""

from hrtech_etl_spark.core.types import (
    BoolJoin,
    Condition,
    Cursor,
    CursorMode,
    JobEventType,
    Operator,
    ProfileEventType,
    PushMode,
    PushResult,
    Resource,
)

__version__ = "0.1.0"

__all__ = [
    "BoolJoin",
    "Condition",
    "Cursor",
    "CursorMode",
    "JobEventType",
    "Operator",
    "ProfileEventType",
    "PushMode",
    "PushResult",
    "Resource",
]
