"""Funnel analysis: ordered event-sequence conversion over an event
log — 'of the users who did A, how many then did B, then C?'.

Spark has no MATCH_RECOGNIZE; the scalable formulation is a chain of
per-step minimal-timestamp aggregations: step k's entry time for a
user is the EARLIEST event of type k strictly after their step-k-1
entry (the standard greedy funnel — earliest entries maximize the
conversion count, so greedy is exact here). Each step costs one
filtered aggregation over events plus an equi-join against the funnel
frontier (one row per step-1 user — unbounded cardinality, so NO
forced broadcast: both sides hash on the user key and AQE downgrades
to broadcast only when the frontier genuinely fits); drop-offs stay
in the frontier with NULL entry times, so ONE pass of the chain
yields every step's count. No per-user sequence materialization, no
UDFs.

``within_seconds`` bounds the whole funnel ANCHORED AT THE USER'S
EARLIEST STEP-1 EVENT: step k must land within that many seconds of
that fixed anchor (the common product-analytics definition). Note the
exactness caveat: greedy earliest-entry is exact for the UNBOUNDED
funnel, but with a window it undercounts users who abandoned an early
step-1 entry and completed from a LATER one — that sliding-anchor
semantic ('completed within the window of ANY step-1 event') is
:func:`funnel_steps_sliding` / :func:`funnel_conversion_sliding`:
the same greedy chain run per step-1 EVENT (greedy stays exact for a
fixed window end — taking the earliest candidate at each step only
leaves more room before the deadline), with a per-user any-match
rollup. Its frontier is one row per step-1 event instead of per user,
so it costs proportionally more — that multiplicity, not a different
algorithm, is the price of the stronger semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel entry times: one row per user who completed
    step 1, with ``t1..tN`` timestamp columns — NULL from the first
    uncompleted step onward (drop-offs keep their earlier times)."""
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    # LINEAR chain of cumulative-progress frames: chain_k holds the
    # users who completed step k with their full (t1..tk) entry times
    # and references chain_{k-1} exactly ONCE. The obvious alternative
    # — frontier_k = frontier_{k-1} LEFT JOIN completed(frontier_{k-1})
    # — nests the frontier subtree TWICE per step, so the step-1
    # aggregation gets planned 2^(N-1) times (exchange reuse collapses
    # only copies whose pushed filters canonicalize identically); here
    # each chain_k subtree appears once in chain_{k+1} and once in the
    # final fan-in, those two occurrences ARE identical, and the
    # runtime reads one ReusedExchange per step. Grouping by
    # (user, t1..t_{k-1}) equals grouping by user — one row per user
    # in chain_{k-1} — and just carries the earlier entry times along.
    #
    # No broadcast hint anywhere: every chain frame is one row per
    # step-1 user (unbounded cardinality at event-log scale), so a
    # forced broadcast would OOM a real cluster. The joins hash on
    # user_col; AQE picks broadcast only when a side is genuinely
    # under the size threshold.
    chain = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    frontier = chain
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(f"t{k - 1}")
        if within_seconds is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col("t1") + F.expr(f"interval {within_seconds} seconds")
            )
        chain = (
            nxt.join(chain, user_col)
            .where(cond)
            .groupBy(user_col, *[f"t{i}" for i in range(1, k)])
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        frontier = frontier.join(
            chain.select(user_col, f"t{k}"), user_col, "left"
        )
    return frontier


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    within_seconds: int | None = None,
) -> DataFrame:
    """The conversion report: one row per funnel step with the number
    of users whose ORDERED sequence reached it and the conversion rate
    vs step 1 — computed from ONE funnel pass (``count(t_k)`` over the
    frontier; counts are monotonically non-increasing by
    construction)."""
    frontier = funnel_steps(
        events,
        user_col,
        ts_col,
        type_col,
        steps,
        within_seconds=within_seconds,
    )
    wide = frontier.agg(
        *[F.count(F.col(f"t{k}")).alias(f"n{k}") for k in range(1, len(steps) + 1)]
    )
    return _step_report(wide, steps)


def _step_report(wide: DataFrame, steps: list[str]) -> DataFrame:
    """Unpivot a 1-row (n1..nN) frame into the per-step conversion
    report shared by both funnel variants."""

    def lit_name(s: str) -> str:
        # Spark SQL string literals escape with backslash (doubled
        # quotes would parse as adjacent-literal concatenation)
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    groups = ", ".join(
        f"{k}, {lit_name(steps[k - 1])}, n{k}"
        for k in range(1, len(steps) + 1)
    )
    return wide.select(
        F.expr(
            f"stack({len(steps)}, {groups}) AS (step, event_type, n_users)"
        ),
        F.col("n1").alias("__n1"),
    ).select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") / F.col("__n1"), 4).alias("conversion"),
    )


def funnel_steps_sliding(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    within_seconds: int,
) -> DataFrame:
    """Sliding-anchor funnel frontier: one row per step-1 EVENT
    ``(user, t1)`` with ``t2..tN`` entry times for the greedy chain
    anchored at that event — step k must land strictly after step k-1
    and within ``within_seconds`` of THIS anchor. Greedy is exact per
    anchor (fixed deadline ``t1 + within``: earliest entries only
    leave more room), so a user converts under 'ANY step-1 window'
    semantics iff some frontier row reaches ``tN``.

    Same hint-free join shape as :func:`funnel_steps` — the frontier
    is unbounded (every step-1 event), so the per-step joins hash on
    the user key and AQE decides the strategy.
    """
    if not steps:
        raise ValueError("funnel_steps_sliding needs at least one step")
    if within_seconds is None:
        raise ValueError(
            "funnel_steps_sliding requires within_seconds — without a "
            "window every anchor is dominated by the earliest one and "
            "funnel_steps is the cheaper identical answer"
        )
    # Same linear-chain shape as funnel_steps (see the comment there),
    # keyed by anchor (user, t1) instead of user alone.
    chain = (
        events.where(F.col(type_col) == steps[0])
        .select(F.col(user_col), F.col(ts_col).alias("t1"))
        .distinct()
    )
    frontier = chain
    deadline = F.col("t1") + F.expr(f"interval {within_seconds} seconds")
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        cond = (F.col("__ts") > F.col(f"t{k - 1}")) & (F.col("__ts") <= deadline)
        chain = (
            nxt.join(chain, user_col)
            .where(cond)
            .groupBy(user_col, *[f"t{i}" for i in range(1, k)])
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        frontier = frontier.join(
            chain.select(user_col, "t1", f"t{k}"), [user_col, "t1"], "left"
        )
    return frontier


def funnel_conversion_sliding(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    within_seconds: int,
) -> DataFrame:
    """Sliding-anchor conversion report: ``n_users`` at step k counts
    users for whom ANY step-1 event's window completes through step k
    — always ≥ the fixed-anchor :func:`funnel_conversion` count, never
    more than the unbounded one. One distinct-user rollup over the
    per-anchor frontier."""
    frontier = funnel_steps_sliding(
        events,
        user_col,
        ts_col,
        type_col,
        steps,
        within_seconds=within_seconds,
    )
    wide = frontier.agg(
        *[
            F.countDistinct(
                F.when(F.col(f"t{k}").isNotNull(), F.col(user_col))
            ).alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    return _step_report(wide, steps)
