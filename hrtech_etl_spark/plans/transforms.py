"""Canonical native↔unified transforms as reusable select plans.

The reference converts per-warehouse native rows to/from its unified
models with per-connector Python methods (``to_unified_job`` /
``from_unified_job`` — ``connectors/warehouse_a/__init__.py:62-123``,
``connectors/hrflow/__init__.py:47-57``). Here each direction is a
**column projection** (pure Catalyst: prunable, pushdown-transparent,
no Python), with the reference's documented fallbacks:

- denormalize id: ``coalesce(id, key)``
  (``connectors/warehouse_a/__init__.py:110``),
- missing created_at falls back to updated_at
  (``connectors/warehouse_a/__init__.py:115-120``),
- unified timestamps stay ``TimestampType`` internally; ISO-8601
  strings exist only at REST edges (SURVEY.md §1.2) via
  :func:`to_rest_edge`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hrtech_etl_spark.core.schemas import (
    UNIFIED_JOB_SCHEMA,
    UNIFIED_PROFILE_SCHEMA,
)

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def _null(dtype: T.DataType):
    return F.lit(None).cast(dtype)


def to_unified_job(native: DataFrame, origin: str) -> DataFrame:
    """Native job rows → unified job rows (normalize)."""
    s = {f.name: f.dataType for f in UNIFIED_JOB_SCHEMA.fields}
    return native.select(
        F.col("job_id").cast("string").alias("id"),
        F.lit(origin).alias("origin"),
        F.col("job_id").cast("string").alias("key"),
        _null(s["reference"]).alias("reference"),
        F.lit(origin).alias("board_key"),
        F.col("created_at").alias("created_at"),
        F.col("updated_at").alias("updated_at"),
        _null(s["archived_at"]).alias("archived_at"),
        F.col("title").alias("name"),
        F.col("title").alias("text"),
        _null(s["location"]).alias("location"),
        _null(s["skills"]).alias("skills"),
        _null(s["tags"]).alias("tags"),
        _null(s["ranges_float"]).alias("ranges_float"),
        F.col("payload").alias("payload"),
    )


def from_unified_job(unified: DataFrame) -> DataFrame:
    """Unified job rows → native job rows (denormalize), with the
    reference's fallbacks: ``id or key``; created_at ← updated_at."""
    return unified.select(
        F.coalesce(F.col("id"), F.col("key")).alias("job_id"),
        F.col("name").alias("title"),
        F.coalesce(F.col("created_at"), F.col("updated_at")).alias("created_at"),
        F.col("updated_at").alias("updated_at"),
        F.col("payload").alias("payload"),
    )


def to_unified_profile(native: DataFrame, origin: str) -> DataFrame:
    s = {f.name: f.dataType for f in UNIFIED_PROFILE_SCHEMA.fields}
    return native.select(
        F.col("profile_id").cast("string").alias("id"),
        F.lit(origin).alias("origin"),
        F.col("profile_id").cast("string").alias("key"),
        F.lit(origin).alias("source_key"),
        F.col("created_at").alias("created_at"),
        F.col("updated_at").alias("updated_at"),
        _null(s["archived_at"]).alias("archived_at"),
        F.struct(
            F.col("full_name").alias("full_name"),
            _null(T.StringType()).alias("first_name"),
            _null(T.StringType()).alias("last_name"),
            _null(T.StringType()).alias("email"),
            _null(s["info"]["location"].dataType).alias("location"),
        ).alias("info"),
        F.col("full_name").alias("text"),
        _null(s["experiences_duration"]).alias("experiences_duration"),
        _null(s["experiences"]).alias("experiences"),
        _null(s["educations"]).alias("educations"),
        _null(s["skills"]).alias("skills"),
        _null(s["tags"]).alias("tags"),
        F.col("payload").alias("payload"),
    )


def from_unified_profile(unified: DataFrame) -> DataFrame:
    return unified.select(
        F.coalesce(F.col("id"), F.col("key")).alias("profile_id"),
        F.col("info.full_name").alias("full_name"),
        F.coalesce(F.col("created_at"), F.col("updated_at")).alias("created_at"),
        F.col("updated_at").alias("updated_at"),
        F.col("payload").alias("payload"),
    )


def to_rest_edge(df: DataFrame) -> DataFrame:
    """Edge serialization: every timestamp column becomes an ISO-8601
    string (the unified models' wire format — ``core/models.py:192-215``
    keeps timestamps as ISO strings; internally we keep TimestampType
    and format only here)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            out = out.withColumn(f.name, F.date_format(F.col(f.name), ISO_FMT))
    return out
