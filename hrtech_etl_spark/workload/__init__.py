"""Declared-query catalog: every operator the engine claims, as a
named (Spark builder, DuckDB oracle SQL) pair.

This is the correctness surface the driver checks (SURVEY.md §2): each
entry's Spark DataFrame result must hash-match its ANSI-SQL oracle on
the same parquet tables. Queries without an exact SQL rendering
(approximate sketches) register ``sql=None`` → rows-only check.

Import side effects register the queries; keep module list exhaustive.
"""

from __future__ import annotations

from hrtech_etl_spark.workload.registry import REGISTRY, QueryDef, query

# Registration side effects. ORDER MATTERS: the driver's correctness
# gate checks the first 50 registry entries in registration order, so
# the LLM-data-pipeline, streaming, and Python-UDF families — the
# differentiating surface — register first; the long-stable relational
# families follow.
from hrtech_etl_spark.workload import text_llm  # noqa: E402,F401
from hrtech_etl_spark.workload import streaming  # noqa: E402,F401
from hrtech_etl_spark.workload import python_udfs  # noqa: E402,F401
from hrtech_etl_spark.workload import etl  # noqa: E402,F401
from hrtech_etl_spark.workload import relational  # noqa: E402,F401
from hrtech_etl_spark.workload import scalars  # noqa: E402,F401
from hrtech_etl_spark.workload import extensions  # noqa: E402,F401

__all__ = ["REGISTRY", "QueryDef", "query"]
