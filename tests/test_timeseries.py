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


# ---------------------------------------------------------------------------
# sessionize (gaps-and-islands)
# ---------------------------------------------------------------------------


def test_sessionize_hand_checked(spark):
    from hrtech_etl_spark.operators.timeseries import sessionize

    rows = [
        # user 1: 3 events within 10 min, then a 2h gap, then 1 event
        (1, 101, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, 102, datetime(2024, 1, 1, 0, 5, 0), 2.0),
        (1, 103, datetime(2024, 1, 1, 0, 10, 0), 3.0),
        (1, 104, datetime(2024, 1, 1, 2, 10, 1), 4.0),
        # user 2: single event; NULL user / NULL ts rows are dropped
        (2, 201, datetime(2024, 1, 1, 1, 0, 0), 10.0),
        (None, 301, datetime(2024, 1, 1, 1, 0, 0), 99.0),
        (2, 202, None, 99.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = sessionize(
        df, "user_id", "ts",
        gap_seconds=3600.0, order_cols=("event_id",), value_col="value",
    )
    got = {
        (r.user_id, r.session_seq): (
            r.n_events, r.duration_sec, r.total_value
        )
        for r in out.collect()
    }
    assert got == {
        (1, 1): (3, 600.0, 6.0),
        (1, 2): (1, 0.0, 4.0),
        (2, 1): (1, 0.0, 10.0),
    }


def test_sessionize_gap_boundary_is_strict(spark):
    """An exactly-gap_seconds spacing does NOT split (strict >)."""
    from hrtech_etl_spark.operators.timeseries import sessionize

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, 2, datetime(2024, 1, 1, 1, 0, 0), 1.0),   # == 3600s later
        (1, 3, datetime(2024, 1, 1, 2, 0, 0, 1), 1.0),  # 3600.000001s
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = sessionize(df, "user_id", "ts", gap_seconds=3600.0)
    seqs = sorted(r.session_seq for r in out.collect())
    assert seqs == [1, 2]


def test_sessionize_single_window_exchange(spark):
    """Plan contract: ONE Exchange for the whole operator. The lag
    flag and the running counter are two Window operators (the sum
    consumes the lag's output) but share one partitioning+sort, and
    the (key, session) rollup's ClusteredDistribution is already
    satisfied by hash(key) — key partitioning co-locates every
    (key, session) group — so the final aggregate reuses the window
    exchange instead of reshuffling."""
    from hrtech_etl_spark.operators.timeseries import sessionize

    rows = [(1, i, datetime(2024, 1, 1, 0, i, 0), 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = sessionize(df, "user_id", "ts", order_cols=("event_id",),
                     gap_seconds=60.0)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    marker = plan.find("Initial Plan")
    if marker != -1:
        plan = plan[:marker]
    lower = plan.lower()
    n_exchange = sum(
        1
        for ln in lower.splitlines()
        if "exchange" in ln and "reused" not in ln
    )
    assert n_exchange == 1, plan
    assert lower.count("sort [") <= 1, plan


# ---------------------------------------------------------------------------
# ewma
# ---------------------------------------------------------------------------

def test_ewma_hand_checked(spark):
    from hrtech_etl_spark.operators.timeseries import ewma

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 10.0, 1),
        (1, datetime(2024, 1, 1, 0, 5), 20.0, 2),
        (1, datetime(2024, 1, 1, 0, 10), 30.0, 3),
        (2, datetime(2024, 1, 1, 0, 0), 5.0, 4),
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double, i bigint")
    out = {
        r["k"]: (r["n_events"], r["ewma"])
        for r in ewma(df, "k", "ts", "v", alpha=0.5, order_cols=("i",)).collect()
    }
    # k=1: e1=10, e2=0.5*10+0.5*20=15, e3=0.5*15+0.5*30=22.5
    assert out[1] == (3, 22.5)
    # single observation: seed only
    assert out[2] == (1, 5.0)


def test_ewma_order_ties_broken_by_order_cols(spark):
    from hrtech_etl_spark.operators.timeseries import ewma

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 100.0, 2), (1, t, 0.0, 1)],
        "k bigint, ts timestamp, v double, i bigint",
    )
    # i=1 (v=0) must seed; i=2 (v=100) smooths on top: 0.5*0 + 0.5*100
    row = ewma(df, "k", "ts", "v", alpha=0.5, order_cols=("i",)).collect()[0]
    assert row["ewma"] == 50.0


def test_ewma_null_ts_and_value_excluded(spark):
    from hrtech_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 10.0, 1),
            (1, None, 99.0, 2),
            (1, datetime(2024, 1, 2), None, 3),
        ],
        "k bigint, ts timestamp, v double, i bigint",
    )
    row = ewma(df, "k", "ts", "v", order_cols=("i",)).collect()[0]
    assert row["n_events"] == 1 and row["ewma"] == 10.0


def test_ewma_string_key_survives_arrow_boundary(spark):
    # regression (round-11 ADVICE): the output key field was hardcoded
    # bigint, so string/date keys failed at the Arrow boundary
    from hrtech_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [
            ("us", datetime(2024, 1, 1), 10.0, 1),
            ("us", datetime(2024, 1, 2), 20.0, 2),
            ("eu", datetime(2024, 1, 1), 4.0, 3),
        ],
        "k string, ts timestamp, v double, i bigint",
    )
    out = {
        r["k"]: (r["n_events"], r["ewma"])
        for r in ewma(df, "k", "ts", "v", alpha=0.5, order_cols=("i",)).collect()
    }
    assert out["us"] == (2, 15.0)
    assert out["eu"] == (1, 4.0)
    res = ewma(df, "k", "ts", "v", alpha=0.5, order_cols=("i",))
    assert res.schema["k"].dataType.typeName() == "string"


def test_ewma_plan_one_exchange_vectorized_udf(spark):
    """Shape contract for the round-11 rewrite: ONE exchange (the key
    groupBy) and a scalar Arrow-vectorized pandas_udf fold — NOT the
    per-group FlatMapGroupsInPandas kernel (which paid one Python
    invocation per key, 3.3s vs 0.21s at sf0.1)."""
    from hrtech_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1.0, 1)],
        "k bigint, ts timestamp, v double, i bigint",
    )
    out = ewma(df, "k", "ts", "v", order_cols=("i",))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    marker = plan.find("Initial Plan")
    if marker != -1:
        plan = plan[:marker]
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange") <= 2  # partial+final agg of ONE shuffle
