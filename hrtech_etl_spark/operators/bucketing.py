"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. If
both tables are written bucketed (and sorted) by the join key with the
same bucket count, Spark's bucketed-scan reader exposes the on-disk
hash partitioning to the planner and the join runs with NO Exchange on
either side — each task zips bucket i with bucket i. The write-time
cost is one shuffle you were going to pay anyway, amortized over every
subsequent join/aggregation on that key.

Rules encoded here:
- bucket count must match across join sides (planner requirement),
- sort within buckets by the key → sort-merge join needs no Sort node,
- bucketed writes go through ``saveAsTable`` (the catalog carries the
  bucket spec; a bare parquet path cannot).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+ sorted) catalog table. ``path``
    makes it external (data at the given location)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With
    bucketing enabled (default) the plan has no Exchange under the
    join — verify with ``assert_no_shuffle_join``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan shuffles either join side — the
    bucketed-layout contract a pipeline relies on at scale."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    if "Exchange hashpartitioning" in final:
        raise AssertionError(
            f"bucketed join still shuffles:\n{final[:2000]}"
        )
