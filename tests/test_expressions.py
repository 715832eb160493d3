"""Condition-algebra semantics tests — parity with the reference's
``_match_condition`` null/coercion rules (``core/utils.py:80-99``)."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.core.expressions import (
    Prefilter,
    PrefilterError,
    apply_conditions,
    conditions_to_column,
    search_conditions_to_column,
)
from hrtech_etl_spark.core.schemas import UNIFIED_JOB_SCHEMA
from hrtech_etl_spark.core.types import Condition, Operator


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", None),
        (3, None, 30.0),
        (4, "alphabet", 40.0),
    ]
    return spark.createDataFrame(rows, "id int, name string, score double")


def ids(df, conds):
    return sorted(r.id for r in apply_conditions(df, conds).collect())


def test_eq(df):
    assert ids(df, [Condition("name", Operator.EQ, "alpha")]) == [1]


def test_eq_null_safe(df):
    # reference: None == None is True (plain Python equality)
    assert ids(df, [Condition("name", Operator.EQ, None)]) == [3]


def test_ordered_ops_fail_on_null(df):
    # rows with NULL score must not match GT/GTE/LT/LTE
    assert ids(df, [Condition("score", Operator.GT, 5.0)]) == [1, 3, 4]
    assert ids(df, [Condition("score", Operator.LTE, 30.0)]) == [1, 3]


def test_in_membership(df):
    assert ids(df, [Condition("name", Operator.IN, ["alpha", "beta"])]) == [1, 2]


def test_in_empty_and_none(df):
    # reference: value or [] → empty list matches nothing
    assert ids(df, [Condition("name", Operator.IN, [])]) == []
    assert ids(df, [Condition("name", Operator.IN, None)]) == []


def test_in_with_null_element(df):
    # Python `None in [None, "alpha"]` is True → NULL rows match
    assert ids(df, [Condition("name", Operator.IN, [None, "alpha"])]) == [1, 3]


def test_contains_substring(df):
    assert ids(df, [Condition("name", Operator.CONTAINS, "alpha")]) == [1, 4]


def test_contains_stringified_non_string(df):
    # CONTAINS stringifies operands: score 30.0 contains "0."
    assert ids(df, [Condition("score", Operator.CONTAINS, "0.0")]) == [1, 3, 4]


def test_conjunction(df):
    conds = [
        Condition("name", Operator.CONTAINS, "alpha"),
        Condition("score", Operator.GTE, 20.0),
    ]
    assert ids(df, conds) == [4]


def test_empty_conditions_is_true(df):
    assert ids(df, []) == [1, 2, 3, 4]


def test_prefilter_whitelist_enforced():
    # board_key allows eq/in; gt must raise (reference core/expressions.py:87-103)
    Prefilter(UNIFIED_JOB_SCHEMA, "board_key").in_(["b1"])
    with pytest.raises(PrefilterError):
        Prefilter(UNIFIED_JOB_SCHEMA, "board_key").gt("x")


def test_prefilter_unknown_field():
    with pytest.raises(KeyError):
        Prefilter(UNIFIED_JOB_SCHEMA, "nope").eq(1)


def test_search_binding_composition(df):
    # (name contains alpha OR name contains beta) AND (name contains a)
    col = search_conditions_to_column(
        {"name": [("name", "alpha"), ("name", "beta")], "name2": [("name", "a")]},
        field_join="AND",
        value_join="OR",
    )
    got = sorted(r.id for r in df.where(col).collect())
    assert got == [1, 2, 4]


def test_export_schema_fields_capabilities():
    from hrtech_etl_spark.core.schemas import (
        UNIFIED_JOB_SCHEMA,
        export_schema_fields,
    )

    rows = {r["name"]: r for r in export_schema_fields(UNIFIED_JOB_SCHEMA)}
    assert rows["updated_at"]["cursor"] == "updated_at"
    assert rows["updated_at"]["prefilter_operators"] == ["gte", "lte"]
    assert rows["name"]["search_binding"]["search_field"] == "names"
    assert rows["board_key"]["in_binding"]["query_field"] == "board_keys"
