"""Declared queries: the Python-UDF escape-hatch surface (§2.9) under
the oracle gate.

The engine's rule is "UDFs are the slow path" — these queries exist to
prove the *fenced* escape hatches work correctly and stay Arrow-
batched, each paired with an exact SQL oracle:

- ``udaf_grouped_agg``    — pandas GROUPED_AGG UDAF (geometric mean),
- ``udtf_grouped_map``    — ``applyInPandas`` grouped-map (per-group
                            z-score outlier count, pandas inside),
- ``udf_map_in_pandas``   — ``mapInPandas`` row-stream transform with
                            a Python-side filter.

All computations are chosen so numpy/pandas and DuckDB agree to
rounding (single IEEE operations on identical inputs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import query


@query(
    "udaf_grouped_agg",
    sql="""
    SELECT o_orderpriority AS priority,
           round(exp(avg(ln(o_totalprice))), 4) AS geo_mean,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def udaf_grouped_agg(spark, sf_dir):
    """pandas GROUPED_AGG UDAF: per-priority geometric mean of order
    totals. Arrow ships each group's column as one pandas Series; the
    kernel is vectorized numpy (no per-row Python)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        # GROUPED_AGG pandas UDFs cannot mix with JVM aggregates in one
        # agg() — the row count rides along as a second pandas UDAF
        return len(v)

    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(geo_mean("o_totalprice"), 4).alias("geo_mean"),
        n_rows("o_totalprice").alias("n"),
    )


@query(
    "udtf_grouped_map",
    sql="""
    SELECT priority, count(CASE WHEN abs(z) > 1.5 THEN 1 END) AS n_outliers FROM (
      SELECT o_orderpriority AS priority,
             (o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
               / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority) AS z
      FROM orders
    ) GROUP BY priority
    """,
)
def udtf_grouped_map(spark, sf_dir):
    """applyInPandas grouped-map: each priority group arrives as ONE
    pandas DataFrame; the kernel computes z-scores and returns the
    group's outlier count. The SQL oracle replicates it with window
    functions — proving the grouped-map path agrees with the
    relational formulation."""
    out_schema = T.StructType(
        [
            T.StructField("priority", T.StringType()),
            T.StructField("n_outliers", T.LongType()),
        ]
    )

    def count_outliers(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["o_totalprice"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {
                "priority": [pdf["o_orderpriority"].iloc[0]],
                "n_outliers": [int((z.abs() > 1.5).sum())],
            }
        )

    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").applyInPandas(count_outliers, out_schema)


@query(
    "udf_map_in_pandas",
    sql="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders
    WHERE length(o_orderpriority) - length(replace(o_orderpriority, '-', '')) = 1
      AND o_totalprice > 1000
    """,
)
def udf_map_in_pandas(spark, sf_dir):
    """mapInPandas stream transform: Python-side filter + projection
    over Arrow batches (the opaque-formatter fence from
    plans/mapping.py), aggregated relationally afterwards."""
    out_schema = T.StructType([T.StructField("o_totalprice", T.DoubleType())])

    def keep_dashed_expensive(batches):
        for pdf in batches:
            mask = (pdf["o_orderpriority"].str.count("-") == 1) & (
                pdf["o_totalprice"] > 1000
            )
            yield pdf.loc[mask, ["o_totalprice"]]

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_totalprice"
    )
    kept = o.mapInPandas(keep_dashed_expensive, out_schema)
    return kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )
