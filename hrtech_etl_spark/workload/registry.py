"""Query registry + portability helpers shared by all workload modules.

Hash-stability rules (the driver compares order-insensitive value
hashes between Spark and DuckDB):

- **Money/measure sums** are computed in DECIMAL (exact, associative →
  order-independent across engines), then rounded and cast to DOUBLE.
- **Averages/ratios** divide two already-identical numbers (decimal
  sum cast to double, count) so both engines perform the same single
  IEEE division, then round.
- **Every computed column is aliased identically** in the DataFrame
  code and the SQL.
- **Window orderings are total** (unique tiebreak column) so ranked
  results are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    sql: Optional[str]  # DuckDB oracle; None → rows-only check
    # hash_exempt: the oracle is SHAPE-matched (same rows/column names)
    # but the values are intentionally different engines' estimates
    # (e.g. HLL++ vs exact COUNT DISTINCT) — gates compare row count +
    # schema and SKIP the value hash for these entries.
    hash_exempt: bool = False


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, sql: str | None = None, hash_exempt: bool = False):
    """Decorator registering a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, sql=sql, hash_exempt=hash_exempt)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Spark-side portability helpers
# ---------------------------------------------------------------------------

def dec(col: str | Column, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, round_to: int = 2) -> Column:
    """Order-independent money sum → double (see module docstring)."""
    return F.round(F.sum(dec(col)), round_to).cast("double")


def davg(col: str | Column, round_to: int = 4) -> Column:
    """avg = double(exact decimal sum) / count, one IEEE division."""
    return F.round(F.sum(dec(col)).cast("double") / F.count(F.lit(1)), round_to)


# ---------------------------------------------------------------------------
# SQL-side (DuckDB dialect) counterparts — keep in lockstep with above
# ---------------------------------------------------------------------------

def sql_dsum(expr: str, round_to: int = 2) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,4))), {round_to}) AS DOUBLE)"


def sql_davg(expr: str, round_to: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / count(*), {round_to})"
    )
