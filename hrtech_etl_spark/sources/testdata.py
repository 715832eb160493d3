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

#: Inferred-schema cache keyed by path with the mtime stored in the
#: VALUE (replaced on mismatch) — the role a catalog/metastore plays
#: for managed tables. Schema inference re-reads parquet footers on
#: EVERY ``spark.read.parquet`` call (measured ~100 ms per call at
#: sf0.1, and a listing+footer pass over every file at cluster scale);
#: the data path is untouched — only the footer-driven schema
#: discovery is skipped on repeat loads. Keying by path bounds the
#: cache at one entry per table (the old (path, mtime) key leaked a
#: stale entry per rewrite for the process lifetime). Staleness
#: window, stated explicitly: the mtime is the single file's (or the
#: directory's) — a part file rewritten IN PLACE inside a directory
#: table does not bump the directory mtime and would serve the old
#: schema; this engine's fixtures are single files and its writers
#: replace whole directories, both of which do bump it.
_SCHEMA_CACHE: dict[str, tuple[float, object]] = {}


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
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    hit = _SCHEMA_CACHE.get(path) if mtime is not None else None
    if hit is not None and hit[0] == mtime:
        df = spark.read.schema(hit[1]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if mtime is not None:
            _SCHEMA_CACHE[path] = (mtime, df.schema)
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
