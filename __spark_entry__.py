"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`hrtech_etl_spark.workload` — the declared-
query catalog (one entry per implemented operator from SURVEY.md §2,
each paired with its DuckDB oracle SQL where exactly expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hrtech_etl_spark.workload import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary (scan → filter → decimal-exact hash aggregation)."""
    return REGISTRY["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; approximate operators
    (HyperLogLog estimates) are omitted → rows-only check."""
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
