"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 3.5+ ``hll_*`` built-ins).

The 100 TB pattern this enables: distinct counts you can PRE-AGGREGATE.
``approx_count_distinct`` answers one query over one scan;
a persisted SKETCH table (one HLL blob per partition/day/key) answers
every future rollup by unioning blobs — no rescan of the data:

    daily  = hll_partial(events, ["day"], "user_id")   # scan once, store
    weekly = hll_rollup(daily_sketches, ["week"])       # merge blobs only
    total  = hll_rollup(daily_sketches, [])             # one global estimate

Sketch blobs are standard Apache DataSketches HLL bytes — mergeable
across jobs, languages, and engines that speak DataSketches. Accuracy
follows lgConfigK (default 12 → ~1.6% rsd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lg_config_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch blob per group — the storable partial aggregate.
    Map-side partial aggregation does most of the work; the shuffle
    carries one small blob per (partition, group)."""
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(
        sketch_col
    )
    if not group_cols:
        return df.agg(agg)
    return df.groupBy(*group_cols).agg(agg)


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    *,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "n_distinct",
    keep_sketch: bool = False,
) -> DataFrame:
    """Merge stored sketch blobs up to a coarser grouping and estimate.
    ``group_cols=[]`` → one global row. ``keep_sketch=True`` also
    returns the merged blob, so rollups chain (day → week → month)
    without ever touching raw data again."""
    merged = F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col)
    rolled = (
        sketches.groupBy(*group_cols).agg(merged)
        if group_cols
        else sketches.agg(merged)
    )
    out = rolled.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )
    return out if keep_sketch else out.drop(sketch_col)
