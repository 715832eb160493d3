"""Event-time normalization shared by batch sources and streaming.

Parquet timestamps written with ``isAdjustedToUTC=false`` read as
``TIMESTAMP_NTZ`` under Spark 4 type inference. Two problems follow:

- ``withWatermark`` rejects NTZ outright, so any streaming pipeline
  over such a file fails at analysis (the round-3 driver breakage);
- a batch query keeps the NTZ column while its streaming twin casts to
  TIMESTAMP (LTZ), so the "same" pipeline emits diverging schemas — a
  schema-sensitive sink (merge_upsert into a parquet target first
  written by the other path) then hits an LTZ/NTZ type conflict.

One normalization, applied at BOTH entry points (``load_table`` for
batch, ``ensure_watermarkable`` for streams), keeps every event-time
column TIMESTAMP (LTZ) everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP (LTZ);
    no-op when the column is already LTZ (or absent).

    The cast interprets the naive stored value in the session timezone.
    The engine pins that to UTC (core/session.py), making the cast an
    identity on the stored instants; under ANY other session timezone
    it would silently shift every event time and window boundary, so
    misuse fails loudly here instead.
    """
    if ts_col not in df.columns:
        return df
    if not isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz != "UTC":
        raise ValueError(
            f"ensure_event_time: casting NTZ column {ts_col!r} requires "
            f"spark.sql.session.timeZone='UTC' (got {tz!r}) — a non-UTC "
            "session would shift every event time and window boundary; "
            "build the session via hrtech_etl_spark.core.session.get_spark"
        )
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
