"""File-format sources/sinks: parquet, JSON, CSV — schema-explicit.

The reference's only "file" inputs are pasted JSON arrays parsed into
models with malformed rows dropped (``app/playground.py:110-175``).
Here that surface generalizes to the engine's batch I/O layer:

- explicit schemas always (inference is a full extra pass over 100 TB
  and silently drifts types between runs),
- PERMISSIVE parse + corrupt-record drop for the reference's
  malformed-row semantics (``from_payload`` → ``None`` → skip),
- writers partition by a column when told to (the upsert layer's
  partition-scoped rewrites depend on it).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT in [f.name for f in schema.fields]:
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT, T.StringType())])


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    multiline: bool = False,
    drop_malformed: bool = True,
) -> DataFrame:
    """Schema-explicit JSON source with the reference's malformed-drop
    semantics: rows that fail to parse are dropped, not nulled into the
    dataset (permissive parse + corrupt-record filter — a plan-level
    filter, no extra pass)."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
    )
    df = reader.json(path)
    if drop_malformed:
        df = df.where(F.col(CORRUPT).isNull())
    return df.drop(CORRUPT)


def read_json_strings(
    spark: SparkSession, payloads: Sequence[str], schema: T.StructType
) -> DataFrame:
    """Parse in-memory JSON strings (the playground paste input,
    ``app/playground.py:110-138``): each string is one record;
    malformed strings drop via the all-null-struct filter."""
    raw = spark.createDataFrame([(p,) for p in payloads], "payload string")
    parsed = raw.select(F.from_json("payload", schema).alias("r"))
    any_field = None
    for f in schema.fields:
        c = F.col("r").getField(f.name).isNotNull()
        any_field = c if any_field is None else (any_field | c)
    return parsed.where(F.col("r").isNotNull() & any_field).select("r.*")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    drop_malformed: bool = True,
) -> DataFrame:
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
    )
    df = reader.csv(path)
    if drop_malformed:
        df = df.where(F.col(CORRUPT).isNull())
    return df.drop(CORRUPT)


def write(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
