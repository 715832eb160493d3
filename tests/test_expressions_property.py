"""Property-based parity: the Column-compiled condition algebra must
agree with a pure-Python model of the documented semantics
(SURVEY.md §2.2 / core/expressions.py docstring) on arbitrary
conditions over a fixed mixed-null dataset."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hrtech_etl_spark.core.expressions import apply_conditions
from hrtech_etl_spark.core.types import Condition, Operator

ROWS = [
    (0, None, None),
    (1, "alpha", 10),
    (2, "beta", -3),
    (3, "alphabet", 0),
    (4, "", 999),
    (5, "10", 10),
    (6, "None", 7),
    (7, "beta", None),
]

VALUES = st.one_of(
    st.none(),
    st.sampled_from(["alpha", "beta", "alphabet", "", "10", "None", "zz", "a"]),
    st.integers(min_value=-5, max_value=1000),
)

ORDERED = {Operator.GT, Operator.GTE, Operator.LT, Operator.LTE}


def model_eval(cond: Condition, row: dict) -> bool:
    """Pure-Python model of the documented null/coercion semantics."""
    v = row[cond.field]
    t = cond.value
    if cond.op is Operator.EQ:
        return v == t
    if cond.op in ORDERED:
        if v is None or t is None:
            return False
        return {
            Operator.GT: v > t,
            Operator.GTE: v >= t,
            Operator.LT: v < t,
            Operator.LTE: v <= t,
        }[cond.op]
    if cond.op is Operator.IN:
        return v in (t or [])
    if cond.op is Operator.CONTAINS:
        if v is None:
            return False
        return str(t) in str(v)
    raise AssertionError


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(ROWS, "id int, name string, score int")


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    field=st.sampled_from(["name", "score"]),
    op=st.sampled_from(list(Operator)),
    value=st.one_of(VALUES, st.lists(VALUES, max_size=3)),
)
def test_condition_matches_model(pdf, field, op, value):
    # shape the value to the operator's arity
    if op is Operator.IN:
        value = value if isinstance(value, list) else [value]
    elif isinstance(value, list):
        value = value[0] if value else None
    # typed columns can't compare against cross-type literals in SQL;
    # the model (like the reference) is dynamically typed, so restrict
    # to type-compatible pairs except for CONTAINS (stringified).
    if op is not Operator.CONTAINS:
        def ok(x):
            if x is None:
                return True
            return isinstance(x, str) if field == "name" else isinstance(x, int)
        if isinstance(value, list):
            if not all(ok(x) for x in value):
                return
        elif not ok(value):
            return

    cond = Condition(field, op, value)
    got = sorted(r["id"] for r in apply_conditions(pdf, [cond]).collect())
    want = sorted(
        row[0]
        for row in ROWS
        if model_eval(cond, {"id": row[0], "name": row[1], "score": row[2]})
    )
    assert got == want, f"{cond}: spark={got} model={want}"
