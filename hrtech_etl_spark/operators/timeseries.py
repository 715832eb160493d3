"""Time-series resampling: bucket → densify → forward-fill.

The hypertable/gap-fill shape (TimescaleDB's ``time_bucket_gapfill`` +
``locf``, InfluxDB's ``fill(previous)``): raw events collapse into
fixed buckets, the bucket grid is DENSIFIED so empty buckets exist as
rows, and gaps carry the last observed value forward. Without the
densify step a downstream consumer can't tell "no data" from "no
row"; without the fill, every chart and join over the series has
holes. Reference analog: none (the reference moves records; it never
aggregates time) — this belongs to the SURVEY §2.10 north-star
surface next to the windowed streaming aggregations.

Scale shape: one (key, bucket) aggregation exchange for the
observations, one broadcast of the 1-row global bounds, one
(key, bucket) join exchange for the grid alignment, one key exchange
for the forward-fill window — all map-side-combined, nothing
driver-side, grid size = |keys| x (range / step) rows exactly as a
real densify costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: date_trunc units the portable gate supports (both engines truncate
#: identically for these; sub-minute or month+ units work in Spark but
#: are not part of the declared-oracle contract).
RESAMPLE_UNITS = {
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 1 WEEK",
}


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    unit: str = "hour",
    round_to: int = 4,
) -> DataFrame:
    """Per-key resampled series on a dense global bucket grid with
    last-observation-carried-forward.

    Buckets are ``date_trunc(unit, ts)``; each observed (key, bucket)
    carries the ROUNDED mean of its NON-NULL values — NULL values are
    "no measurement", and a bucket whose every value is NULL is a gap,
    not an observation — (decimal sum → one IEEE
    division → round, the engine-portable average from
    :mod:`hrtech_etl_spark.workload.registry`); the grid spans the
    GLOBAL [min, max] bucket for every key (the dashboard/feature-
    matrix shape — every series aligned on one axis), and empty
    buckets take the key's previous value. Buckets before a key's
    first observation stay NULL — fabricating a value there would be
    lying; filter ``is_observed OR value IS NOT NULL`` to trim
    leading gaps.

    Output: (key, bucket, value, is_observed).
    """
    if unit not in RESAMPLE_UNITS:
        raise ValueError(
            f"unit must be one of {sorted(RESAMPLE_UNITS)}, got {unit!r}"
        )
    from pyspark.sql import Window as W

    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = (
        df.select(
            F.col(key_col),
            bucket.alias("bucket"),
            F.col(value_col).cast("decimal(18,4)").alias("__v"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            # count NON-NULL values, not rows: a NULL value is "no
            # measurement", so it must neither dilute the mean nor make
            # a bucket observed — a bucket whose every value is NULL
            # aggregates to NULL and counts as a gap.
            F.round(
                F.sum("__v").cast("double") / F.count("__v"), round_to
            ).alias("__v_obs")
        )
    )
    bounds = obs.agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    keys = df.select(key_col).distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__mn"),
                F.col("__mx"),
                F.expr(RESAMPLE_UNITS[unit]),
            )
        ).alias("bucket"),
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.join(obs, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.last("__v_obs", ignorenulls=True).over(w).alias("value"),
        F.col("__v_obs").isNotNull().alias("is_observed"),
    )
