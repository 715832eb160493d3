"""HLL sketch tooling: partial/rollup estimates vs exact distinct
counts, and the merge-equals-rebuild property that makes the blobs
reusable across jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.sketches import hll_partial, hll_rollup
from hrtech_etl_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def events(spark, sf_medium):
    return load_table(spark, "events", sf_medium).withColumn(
        "day", F.to_date("ts")
    )


def test_rollup_matches_exact_within_tolerance(spark, events):
    daily = hll_partial(events, ["day"], "user_id")
    total = hll_rollup(daily, []).collect()[0]["n_distinct"]
    exact = events.select("user_id").distinct().count()
    assert abs(total - exact) <= max(2, 0.05 * exact)


def test_merge_equals_direct_sketch(spark, events):
    """Unioning per-day blobs must estimate the same as sketching the
    whole table directly — the property that makes PERSISTED partials
    valid forever (no rescan on rollup)."""
    direct = hll_rollup(hll_partial(events, [], "user_id"), []).collect()[0][
        "n_distinct"
    ]
    merged = hll_rollup(hll_partial(events, ["day"], "user_id"), []).collect()[
        0
    ]["n_distinct"]
    assert direct == merged


def test_grouped_rollup(spark, events):
    weekly = hll_rollup(
        hll_partial(events, ["day", "event_type"], "user_id"),
        ["event_type"],
    )
    got = {r["event_type"]: r["n_distinct"] for r in weekly.collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(2, 0.05 * v)


def test_blob_roundtrip_through_storage(spark, events, tmp_path):
    """Write the sketch table to parquet, read it back, roll up — the
    cross-job reuse path."""
    p = str(tmp_path / "daily_sketches")
    hll_partial(events, ["day"], "user_id").write.parquet(p)
    stored = spark.read.parquet(p)
    total = hll_rollup(stored, []).collect()[0]["n_distinct"]
    live = hll_rollup(hll_partial(events, ["day"], "user_id"), []).collect()[
        0
    ]["n_distinct"]
    assert total == live
