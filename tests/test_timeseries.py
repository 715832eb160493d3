"""resample_forward_fill: densify + LOCF semantics on a hand-checked
series, plus validation."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.timeseries import resample_forward_fill


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # user 1: observations at 00h (two values -> mean) and 03h
        (1, _ts(0, 5), 10.0),
        (1, _ts(0, 45), 20.0),
        (1, _ts(3, 10), 40.0),
        # user 2: first observation only at 02h -> leading NULLs
        (2, _ts(2, 30), 7.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_dense_grid_locf_and_leading_nulls(spark, series):
    out = resample_forward_fill(
        series, "user_id", "ts", "value", unit="hour"
    ).collect()
    got = {(r["user_id"], r["bucket"].hour): r for r in out}
    # global grid: hours 0..3 for BOTH users
    assert len(out) == 8
    assert {k[1] for k in got} == {0, 1, 2, 3}
    # user 1: mean at 0, carried through 1-2, new obs at 3
    assert got[(1, 0)]["value"] == 15.0 and got[(1, 0)]["is_observed"]
    assert got[(1, 1)]["value"] == 15.0 and not got[(1, 1)]["is_observed"]
    assert got[(1, 2)]["value"] == 15.0 and not got[(1, 2)]["is_observed"]
    assert got[(1, 3)]["value"] == 40.0 and got[(1, 3)]["is_observed"]
    # user 2: NULL before its first observation, carried after
    assert got[(2, 0)]["value"] is None and not got[(2, 0)]["is_observed"]
    assert got[(2, 1)]["value"] is None
    assert got[(2, 2)]["value"] == 7.0 and got[(2, 2)]["is_observed"]
    assert got[(2, 3)]["value"] == 7.0 and not got[(2, 3)]["is_observed"]


def test_unit_validation(spark, series):
    with pytest.raises(ValueError, match="unit"):
        resample_forward_fill(series, "user_id", "ts", "value", unit="month")


def test_day_unit_single_bucket(spark, series):
    out = resample_forward_fill(
        series, "user_id", "ts", "value", unit="day"
    ).collect()
    assert len(out) == 2  # one day bucket per user
    by_user = {r["user_id"]: r for r in out}
    assert by_user[1]["value"] == round((10 + 20 + 40) / 3, 4)
    assert by_user[2]["value"] == 7.0


def test_null_values_do_not_dilute_or_observe(spark):
    """NULL values are 'no measurement': they don't dilute a bucket's
    mean, and a bucket whose every value is NULL is a gap (LOCF carries
    over it), not an observation."""
    rows = [
        (1, _ts(0, 5), 10.0),
        (1, _ts(0, 45), None),  # same bucket as the 10.0 -> mean 10, not 5
        (1, _ts(1, 10), None),  # all-NULL bucket -> gap, carries 10.0
        (1, _ts(2, 20), 30.0),
    ]
    out = resample_forward_fill(
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double"),
        "user_id",
        "ts",
        "value",
        unit="hour",
    ).collect()
    got = {r["bucket"].hour: (r["value"], r["is_observed"]) for r in out}
    assert got[0] == (10.0, True)
    assert got[1] == (10.0, False)
    assert got[2] == (30.0, True)
