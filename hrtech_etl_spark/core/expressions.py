"""Condition-algebra → Spark Column compiler.

The reference evaluates ``Condition`` atoms per Python object
(``core/utils.py:80-122``) and separately compiles *pushable* subsets
into backend HTTP params (``core/utils.py:291-652``). On Spark both
collapse into one thing: a ``Column`` expression attached to the
DataFrame plan — Catalyst then pushes whatever the source supports
(parquet row-group filters, DataSource V2 pushFilters) and keeps the
rest as a residual ``Filter``. Unlike the reference's silent partial
pushdown (``core/utils.py:309-311``), nothing is ever dropped.

Null semantics (parity with ``_match_condition``, ``core/utils.py:80-99``):

- ordered ops (GT/GTE/LT/LTE) fail when either operand is NULL,
- EQ uses null-safe equality (``None == None`` is True in the reference),
- IN with a NULL/empty list matches nothing; a NULL element in the list
  matches NULL column values (Python ``None in [None]``),
- CONTAINS stringifies both operands and does case-sensitive substring
  containment; NULL column values match nothing (deliberate deviation
  from the reference's ``str(None) == "None"`` artifact — catalogued as
  a defect, SURVEY.md §7.3/§8).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hrtech_etl_spark.core.schemas import prefilter_operators
from hrtech_etl_spark.core.types import Condition, Operator


def condition_to_column(cond: Condition) -> Column:
    """Compile one Condition atom to a boolean Column."""
    col = F.col(cond.field)
    op = cond.op
    if op is Operator.EQ:
        return col.eqNullSafe(F.lit(cond.value))
    if op is Operator.GT:
        return col > F.lit(cond.value)
    if op is Operator.GTE:
        return col >= F.lit(cond.value)
    if op is Operator.LT:
        return col < F.lit(cond.value)
    if op is Operator.LTE:
        return col <= F.lit(cond.value)
    if op is Operator.IN:
        values = list(cond.value or [])
        if not values:
            return F.lit(False)
        non_null = [v for v in values if v is not None]
        expr = col.isin(non_null) if non_null else F.lit(False)
        if any(v is None for v in values):
            expr = expr | col.isNull()
        return expr
    if op is Operator.CONTAINS:
        return col.cast("string").contains(str(cond.value))
    raise ValueError(f"unsupported operator: {op!r}")


def conditions_to_column(conds: Iterable[Condition]) -> Column:
    """Conjunction of condition atoms (the reference's postfilter is
    conjunctive — ``core/utils.py:102-122``). Empty input → TRUE."""
    cols = [condition_to_column(c) for c in conds]
    if not cols:
        return F.lit(True)
    return reduce(lambda a, b: a & b, cols)


def apply_conditions(df: DataFrame, conds: Sequence[Condition] | None) -> DataFrame:
    """``df.where(cond1 & cond2 & ...)`` — Catalyst splits pushable vs
    residual parts automatically."""
    if not conds:
        return df
    return df.where(conditions_to_column(conds))


class PrefilterError(ValueError):
    """Raised when a condition uses an operator outside the field's
    pushdown-capability whitelist (reference ``core/expressions.py:87-103``)."""


def validate_prefilters(schema: T.StructType, conds: Sequence[Condition]) -> None:
    """Enforce per-field operator whitelists from StructField metadata.

    Fields without a whitelist accept any operator (matches the
    reference, where only annotated fields are prefilterable at the
    REST edge but our file sources accept arbitrary predicates).
    """
    for cond in conds:
        allowed = prefilter_operators(schema, cond.field)
        if allowed is not None and cond.op.value not in allowed:
            raise PrefilterError(
                f"operator {cond.op.value!r} not allowed on field "
                f"{cond.field!r}; allowed: {allowed}"
            )


class Prefilter:
    """Fluent Condition builder with whitelist validation — the Spark
    counterpart of the reference's ``Prefilter`` (``core/expressions.py:9-103``).

    >>> Prefilter(UNIFIED_JOB_SCHEMA, "board_key").in_(["b1", "b2"])
    Condition(field='board_key', op=<Operator.IN: 'in'>, value=['b1', 'b2'])
    """

    def __init__(self, schema: T.StructType, field: str):
        self._schema = schema
        self._field = field

    def _build(self, op: Operator, value) -> Condition:
        cond = Condition(self._field, op, value)
        validate_prefilters(self._schema, [cond])
        return cond

    def eq(self, value) -> Condition:
        return self._build(Operator.EQ, value)

    def gt(self, value) -> Condition:
        return self._build(Operator.GT, value)

    def gte(self, value) -> Condition:
        return self._build(Operator.GTE, value)

    def lt(self, value) -> Condition:
        return self._build(Operator.LT, value)

    def lte(self, value) -> Condition:
        return self._build(Operator.LTE, value)

    def contains(self, value) -> Condition:
        return self._build(Operator.CONTAINS, value)

    def in_(self, value) -> Condition:
        return self._build(Operator.IN, value)


# ---------------------------------------------------------------------------
# Search-binding boolean composition (reference core/utils.py:354-474)
# ---------------------------------------------------------------------------

def search_conditions_to_column(
    groups: dict[str, list[tuple[str, str]]],
    field_join: str = "AND",
    value_join: str = "OR",
) -> Column:
    """Compose CONTAINS conditions grouped by field into one boolean
    Column: values within a field joined by ``value_join``, fields
    joined by ``field_join`` — the reference builds the same shape as a
    backend query *string* (``(a OR b) AND (c)``); here it stays a
    Column so Catalyst can evaluate it distributed.

    ``groups`` maps field name → list of (field, value) CONTAINS pairs.
    """

    def join_cols(cols: list[Column], how: str) -> Column:
        op = (lambda a, b: a | b) if how.upper() == "OR" else (lambda a, b: a & b)
        return reduce(op, cols)

    field_exprs = []
    for _field, pairs in groups.items():
        value_exprs = [
            F.col(f).cast("string").contains(str(v)) for f, v in pairs
        ]
        field_exprs.append(join_cols(value_exprs, value_join))
    if not field_exprs:
        return F.lit(True)
    return join_cols(field_exprs, field_join)
