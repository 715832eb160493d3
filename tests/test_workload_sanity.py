"""Sanity bounds for declared queries whose values the DuckDB oracle
cannot check exactly (approximate sketches get rows-only driver checks;
these tests give the estimates teeth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload import REGISTRY


def test_approx_distinct_within_tolerance(spark, sf_medium):
    """HyperLogLog++ estimate (rsd=0.02) must sit within 5% of the
    exact per-group distinct count — the rows-only oracle row for
    `agg_approx_distinct` plus this bound pins the values too."""
    approx = {
        r["returnflag"]: r["approx_parts"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_medium).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, "lineitem", sf_medium)
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.05, (
            flag,
            est,
            exact[flag],
        )
