"""Property tests: interval_overlap_join and hierarchy_closure vs
brute-force references on random inputs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.graph import hierarchy_closure
from hrtech_etl_spark.operators.joins import interval_overlap_join


@st.composite
def intervals(draw, n_max=12):
    n = draw(st.integers(1, n_max))
    out = []
    for i in range(n):
        s = draw(st.integers(0, 200))
        d = draw(st.integers(0, 40))
        out.append((i, float(s), float(s + d)))
    return out


@settings(max_examples=8, deadline=None)
@given(l=intervals(), r=intervals())
def test_interval_overlap_matches_bruteforce(spark, l, r):
    ldf = spark.createDataFrame(l, "lid long, ls double, le double")
    rdf = spark.createDataFrame(r, "rid long, rs double, re double")
    got = {
        (x["lid"], x["rid"])
        for x in interval_overlap_join(
            ldf, rdf,
            left_start=F.col("ls"), left_end=F.col("le"),
            right_start=F.col("rs"), right_end=F.col("re"),
            bucket_seconds=13,
        ).collect()
    }
    expect = {
        (li, ri)
        for li, ls, le in l
        for ri, rs, re in r
        if ls < re and rs < le
    }
    assert got == expect


@st.composite
def forests(draw, n_max=14):
    """Random parent-pointer forest: parent of k is drawn from
    0..k-1 (or self for roots), so it is always acyclic."""
    n = draw(st.integers(2, n_max))
    rows = [(0, 0)]
    for k in range(1, n):
        parent = draw(st.integers(0, k - 1)) if draw(st.booleans()) else k
        rows.append((k, parent))
    return rows


@settings(max_examples=8, deadline=None)
@given(rows=forests())
def test_hierarchy_closure_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "k long, parent long")
    got = {
        (r["k"], r["ancestor"])
        for r in hierarchy_closure(df, "k", "parent").collect()
    }
    parent = dict(rows)
    expect = set()
    for k, _ in rows:
        cur = k
        while parent[cur] != cur:
            expect.add((k, parent[cur]))
            cur = parent[cur]
    assert got == expect
