"""Property test: funnel_conversion against a pure-Python greedy
reference over random event logs (unbounded and windowed)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from hrtech_etl_spark.operators.funnel import (
    funnel_conversion,
    funnel_conversion_sliding,
)

BASE = dt.datetime(2026, 1, 1)
STEPS = ["s1", "s2", "s3"]


def _py_funnel(rows, steps, within=None):
    """Greedy fixed-anchor reference: per user, t1 = min step-1 ts;
    t_k = min step-k ts strictly after t_{k-1} (and within the window
    of t1 when bounded)."""
    by_user: dict = {}
    for u, typ, ts in rows:
        by_user.setdefault(u, []).append((typ, ts))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        prev = None
        anchor = None
        for k, step in enumerate(steps):
            cands = [
                ts
                for typ, ts in evs
                if typ == step
                and (prev is None or ts > prev)
                and (
                    within is None
                    or anchor is None
                    or ts <= anchor + dt.timedelta(seconds=within)
                )
            ]
            if not cands:
                break
            prev = min(cands)
            if k == 0:
                anchor = prev
            counts[k] += 1
    return counts


def _py_funnel_sliding(rows, steps, within):
    """Sliding-anchor reference: per user, run the greedy chain from
    EVERY step-1 event (deadline anchor + within); a user counts at
    step k when any anchor's chain reaches it."""
    by_user: dict = {}
    for u, typ, ts in rows:
        by_user.setdefault(u, []).append((typ, ts))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        anchors = sorted(ts for typ, ts in evs if typ == steps[0])
        best = 0
        for a in anchors:
            prev, depth = a, 1
            for step in steps[1:]:
                cands = [
                    ts
                    for typ, ts in evs
                    if typ == step
                    and ts > prev
                    and ts <= a + dt.timedelta(seconds=within)
                ]
                if not cands:
                    break
                prev = min(cands)
                depth += 1
            best = max(best, depth)
        for k in range(best):
            counts[k] += 1
    return counts


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    rows = []
    for _ in range(n):
        u = draw(st.integers(min_value=1, max_value=4))
        typ = draw(st.sampled_from(STEPS + ["noise"]))
        ts = BASE + dt.timedelta(seconds=draw(st.integers(0, 120)))
        rows.append((u, typ, ts))
    return rows


@settings(max_examples=12, deadline=None)
@given(rows=event_log(), within=st.sampled_from([None, 30, 60]))
def test_funnel_matches_reference(spark, rows, within):
    want = _py_funnel(rows, STEPS, within)
    if want[0] == 0:
        return  # empty funnel: conversion undefined, operator returns 0 rows
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            df, "user_id", "ts", "event_type", STEPS, within_seconds=within
        ).collect()
    }
    assert [out[k] for k in (1, 2, 3)] == want


@settings(max_examples=12, deadline=None)
@given(rows=event_log(), within=st.sampled_from([15, 30, 60]))
def test_sliding_funnel_matches_reference(spark, rows, within):
    want = _py_funnel_sliding(rows, STEPS, within)
    fixed = _py_funnel(rows, STEPS, within)
    if want[0] == 0:
        return
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion_sliding(
            df, "user_id", "ts", "event_type", STEPS, within_seconds=within
        ).collect()
    }
    got = [out[k] for k in (1, 2, 3)]
    assert got == want
    # any-anchor counts dominate the fixed-anchor ones, step by step
    assert all(g >= f for g, f in zip(got, fixed))
