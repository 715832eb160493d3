"""Declared queries: table profiling and z-order layout keys.

Registered AFTER the long-stable families — these extend the declared
surface without reordering the existing gate entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.operators.layout import zorder_key, zorder_key_sql
from hrtech_etl_spark.operators.profiling import profile_sql, profile_table
from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import query

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]

#: Quantization ranges for the z-order demo key. Deliberately the
#: sf0.01 stats: the quantizer CLAMPS out-of-range values (stale-stats
#: tolerance), and the oracle applies the identical clamp, so the
#: query stays correct at every scale factor.
_ZSPEC = [("user_id", 0, 149), ("v_int", 0, 490)]
_ZBITS = 8


@query(
    "profile_documents",
    sql=profile_sql("documents", _PROFILE_COLS),
)
def profile_documents(spark, sf_dir):
    """Single-pass per-column profile of the documents table (exact
    distinct counts so the DuckDB oracle can value-match; the
    ``exact=False`` HLL default is the 100 TB path — see
    :mod:`hrtech_etl_spark.operators.profiling`)."""
    docs = load_table(spark, "documents", sf_dir)
    return profile_table(docs, _PROFILE_COLS, exact=True)


@query(
    "layout_zorder_key",
    sql=f"""
    SELECT event_id, user_id, v_int, {zorder_key_sql(_ZSPEC, bits=_ZBITS)} AS z
    FROM (
      SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v_int
      FROM events
    )
    ORDER BY z, event_id LIMIT 100
    """,
)
def layout_zorder_key(spark, sf_dir):
    """Morton key computation over (user_id, floor(value)) — the pure
    expression core of :func:`write_zordered`, value-checked bit for
    bit against the DuckDB rendering. Total order (z, event_id) keeps
    the LIMIT deterministic."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "v_int", F.floor(F.col("value")).cast("long")
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "v_int",
            zorder_key(_ZSPEC, bits=_ZBITS).alias("z"),
        )
        .orderBy("z", "event_id")
        .limit(100)
    )
