"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (on in our session defaults) handles skewed
*sort-merge joins* at runtime. Salting remains the right tool where
AQE cannot help:

- **groupBy on a hot key** — one reducer gets the giant group. Two-
  phase salted aggregation splits each group into ``n_salts`` partial
  groups, then merges partials: the hot key's work spreads across
  ``n_salts`` tasks, at the cost of one extra (tiny) shuffle of
  partial aggregates.
- **count-distinct on a hot group** — partials must carry the distinct
  set; salting by the *distinct column itself* keeps partial state
  disjoint, so the merge is a plain sum.
- **joining a hot-keyed fact against a non-broadcastable dim** —
  replicate the dim row ``n_salts`` times, salt the fact side
  deterministically, join on (key, salt).

Salts are DETERMINISTIC (hash-derived from a unique column, never
``rand()``): retried tasks must salt identically or shuffle retries
double-count rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe ``groupBy(keys).agg(sum, count)``.

    Phase 1 groups on (keys, salt(salt_col)) — the hot key fans out
    over ``n_salts`` reducers; phase 2 merges the (keys × n_salts)
    partials. Result == the direct aggregation, per-reducer peak
    memory and time ÷ n_salts on the hot key.
    """
    partial = (
        df.withColumn("__salt", _salt(F.col(salt_col), n_salts))
        .groupBy(*group_cols, "__salt")
        .agg(
            F.sum(value_col).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("n"),
    )


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe ``countDistinct(distinct_col)`` per group.

    Salting by the distinct column itself partitions each group's
    distinct *domain* (not its rows): partial distinct counts are over
    disjoint value sets, so the final merge is ``sum`` — no set union,
    no giant reducer state.
    """
    partial = (
        df.withColumn("__salt", _salt(F.col(distinct_col), n_salts))
        .groupBy(*group_cols, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__pd"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__pd").alias(f"n_distinct_{distinct_col}")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    fact_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim rows replicate ``n_salts``×, fact rows
    salt deterministically from ``fact_unique_col``; the join key
    becomes (key, salt) so a hot key's probe work spreads over
    ``n_salts`` tasks. Use when dim is too big to broadcast and AQE
    skew splitting can't kick in (e.g. the fact side is already
    partitioned by key for a later stage)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    dim_rep = dim.select("*", salts)
    fact_s = fact.withColumn("__salt", _salt(F.col(fact_unique_col), n_salts))
    return fact_s.join(dim_rep, on=[key, "__salt"], how=how).drop("__salt")
