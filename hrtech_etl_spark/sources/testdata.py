"""Loaders for the driver-generated testdata star schema.

One parquet file per table per scale factor (TESTDATA.md). At cluster
scale the same API points at partitioned parquet/Delta roots; nothing
below assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hrtech_etl_spark.core.eventtime import ensure_event_time
from hrtech_etl_spark.core.partitioning import spread as _spread
from hrtech_etl_spark.core.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Inferred-schema cache keyed (path, mtime) — the role a catalog/
#: metastore plays for managed tables. Schema inference re-reads
#: parquet footers on EVERY ``spark.read.parquet`` call (measured
#: ~100 ms per call at sf0.1, and a listing+footer pass over every
#: file at cluster scale); the data path is untouched — only the
#: footer-driven schema discovery is skipped on repeat loads, and the
#: mtime key drops the cache if a file is ever rewritten.
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table as a DataFrame (columnar parquet scan;
    Catalyst handles predicate pushdown / column pruning downstream).

    Timestamp-nanos columns (events.ts is parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects) are read as raw nanos via
    the legacy long path and truncated to microsecond timestamps —
    matching how DuckDB/Arrow coerce nanos to their µs timestamps.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # Runtime-settable SQL conf; harmless for non-nanos files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        key = None
    if key is not None and key in _SCHEMA_CACHE:
        df = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # TIMESTAMP(MICROS) with isAdjustedToUTC=false reads as NTZ:
        # normalize to LTZ here, the SAME cast the streaming side's
        # ensure_watermarkable applies, so batch and streaming twins
        # emit identical schemas (UTC-asserted, identity on values).
        df = ensure_event_time(df, "ts")
    return df


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Scale-conditional round-robin repartition ahead of a CPU-heavy
    projection — re-exported from :mod:`hrtech_etl_spark.core.partitioning`
    (see its docstring: widens a narrow single-file scan, identity on an
    already-wide cluster scan)."""
    return _spread(df, n)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
