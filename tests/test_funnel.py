"""Funnel operator: ordered-sequence semantics, drop-offs, the within
bound, and monotone step counts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.funnel import funnel_conversion, funnel_steps


def _t(m):
    return dt.datetime(2026, 1, 1, 0, m)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes in order
        (1, "view", _t(0)), (1, "click", _t(5)), (1, "purchase", _t(9)),
        # u2: purchase BEFORE click → not a conversion at step 3
        (2, "view", _t(0)), (2, "purchase", _t(2)), (2, "click", _t(4)),
        # u3: view only
        (3, "view", _t(1)),
        # u4: click/purchase but never viewed → not in the funnel at all
        (4, "click", _t(0)), (4, "purchase", _t(1)),
        # u5: completes but slowly (step 3 at +30min)
        (5, "view", _t(0)), (5, "click", _t(10)), (5, "purchase", _t(30)),
    ]
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_ordered_semantics(ev):
    out = {r["step"]: r for r in funnel_conversion(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out[1]["n_users"] == 4          # u1, u2, u3, u5 viewed
    assert out[2]["n_users"] == 3          # u1, u2, u5 clicked after view
    assert out[3]["n_users"] == 2          # u1, u5 purchased after click
    assert out[3]["conversion"] == 0.5
    # monotone by construction
    assert out[1]["n_users"] >= out[2]["n_users"] >= out[3]["n_users"]


def test_within_bound(ev):
    out = {r["step"]: r["n_users"] for r in funnel_conversion(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        within_seconds=15 * 60,
    ).collect()}
    assert out[3] == 1  # u5's purchase at +30min falls outside the bound


def test_no_forced_broadcast_on_frontier(ev):
    """The frontier is one row per step-1 user — unbounded cardinality
    at event-log scale, so NO forced broadcast hint may survive in the
    plan (AQE alone decides the join strategy; a hint overriding the
    size threshold OOMs a real cluster)."""
    fr = funnel_steps(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    analyzed = fr._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed


def test_steps_frontier_nulls(ev):
    fr = {r["user_id"]: r for r in funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert 4 not in fr                      # never entered the funnel
    assert fr[3]["t2"] is None and fr[3]["t3"] is None
    assert fr[2]["t2"] is not None and fr[2]["t3"] is None
    assert fr[1]["t3"] == _t(9)


def test_sliding_recovers_abandoned_anchor(ev):
    """The documented fixed-anchor undercount: a user whose EARLIEST
    step-1 event's window expires but who completes from a LATER
    step-1 event counts under sliding semantics."""
    from hrtech_etl_spark.operators.funnel import funnel_conversion_sliding

    rows = [
        # early view whose 10-min window sees nothing
        (9, "view", _t(0)),
        # later view opens a window that completes
        (9, "view", _t(40)), (9, "click", _t(42)), (9, "purchase", _t(45)),
    ]
    df = ev.sparkSession.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    fixed = {r["step"]: r["n_users"] for r in funnel_conversion(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        within_seconds=600,
    ).collect()}
    sliding = {r["step"]: r["n_users"] for r in funnel_conversion_sliding(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        within_seconds=600,
    ).collect()}
    assert fixed[3] == 0      # anchored at _t(0): chain dies
    assert sliding[3] == 1    # the _t(40) anchor completes


def test_sliding_requires_window(ev):
    from hrtech_etl_spark.operators.funnel import funnel_steps_sliding

    with pytest.raises(ValueError, match="within_seconds"):
        funnel_steps_sliding(
            ev, "user_id", "ts", "event_type", ["view", "click"],
            within_seconds=None,
        )
