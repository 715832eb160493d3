"""Property test: resample_forward_fill against a pure-Python
densify+LOCF reference over random sparse series."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from hrtech_etl_spark.operators.timeseries import resample_forward_fill

BASE = dt.datetime(2025, 6, 1)


def _reference(rows):
    if not rows:
        return {}
    obs: dict = {}
    for u, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        obs.setdefault((u, b), []).append(v)
    means = {k: round(sum(vs) / len(vs), 4) for k, vs in obs.items()}
    buckets = sorted({b for _, b in means})
    lo, hi = buckets[0], buckets[-1]
    grid = []
    b = lo
    while b <= hi:
        grid.append(b)
        b += dt.timedelta(hours=1)
    out = {}
    for u in sorted({u for u, _, _ in rows}):
        carried = None
        for b in grid:
            observed = (u, b) in means
            if observed:
                carried = means[(u, b)]
            out[(u, b)] = (carried, observed)
    return out


@st.composite
def series(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    rows = []
    for _ in range(n):
        u = draw(st.integers(min_value=1, max_value=3))
        ts = BASE + dt.timedelta(minutes=draw(st.integers(0, 60 * 48)))
        v = float(draw(st.integers(min_value=0, max_value=100)))
        rows.append((u, ts, v))
    return rows


@settings(max_examples=10, deadline=None)
@given(rows=series())
def test_resample_matches_locf_reference(spark, rows):
    want = _reference(rows)
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket"]): (r["value"], r["is_observed"])
        for r in resample_forward_fill(
            df, "user_id", "ts", "value", unit="hour"
        ).collect()
    }
    assert got == want
