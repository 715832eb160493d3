"""Property tests: zorder_key against a pure-Python Morton reference
over random specs/values, and bloom sizing math invariants."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hrtech_etl_spark.operators.bloom import BloomFilter
from tests.test_layout import _ref_morton


@st.composite
def spec_and_rows(draw):
    d = draw(st.integers(min_value=1, max_value=3))
    bits = draw(st.integers(min_value=1, max_value=12))
    spec = []
    for j in range(d):
        lo = draw(st.integers(min_value=-1000, max_value=1000))
        hi = lo + draw(st.integers(min_value=0, max_value=5000))
        spec.append((f"c{j}", lo, hi))
    rows = draw(
        st.lists(
            st.tuples(
                *[
                    st.one_of(
                        st.none(),
                        st.integers(min_value=lo - 100, max_value=hi + 100),
                    )
                    for (_, lo, hi) in spec
                ]
            ),
            min_size=1,
            max_size=8,
        )
    )
    return spec, bits, rows


# One shared session via the pytest fixture; hypothesis drives the
# VALUES, Spark evaluates the expression per example — keep examples
# few (each is a tiny local job).
@settings(max_examples=12, deadline=None)
@given(sb=spec_and_rows())
def test_zorder_matches_reference(spark, sb):
    from pyspark.sql import functions as F  # noqa: F401

    from hrtech_etl_spark.operators.layout import zorder_key

    spec, bits, rows = sb
    schema = ", ".join(f"c{j} long" for j in range(len(spec)))
    df = spark.createDataFrame(rows, schema)
    got = [
        r["z"] for r in df.select(zorder_key(spec, bits=bits).alias("z")).collect()
    ]
    want = [_ref_morton(v, spec, bits) for v in rows]
    assert got == want
    assert all(0 <= z < (1 << (bits * len(spec))) for z in got)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10**9),
    fpp=st.floats(min_value=1e-6, max_value=0.5),
)
def test_bloom_size_for_invariants(n, fpp):
    m, k = BloomFilter.size_for(n, fpp)
    assert 1 <= m <= (1 << 29)
    assert k >= 1
    # k derives from the ACTUAL m (capped or not): never more hashes
    # than the uncapped optimum for this m
    import math

    assert k <= max(1, round(m / n * math.log(2))) or k == 1
