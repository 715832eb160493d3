"""Repo-wide window plan contract: NO query in the registry may carry a
Window (or WindowGroupLimit) node with an EMPTY partition spec.

An empty partitionSpec makes Spark move EVERY row to one partition
(``WindowExec: No Partition Defined ... Moving all data to a single
partition``) — invisible at sf0.1, fatal at 100 TB. The round-12
verdict flagged the last two such plans (window_rank_suite,
events_rfm_segments); both now use the distributed exact-rank plan
(operators/ranking.py), and the knob-bounded shard-totals windows
(corpus.py, ranking.py) declare their single partition explicitly via
``core.partitioning.bounded_window_key`` — so the repo-wide budget for
empty specs is ZERO, with no whitelist to rot."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.core.partitioning import unpartitioned_windows
from hrtech_etl_spark.workload import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["window_rank_suite", "events_rfm_segments"])
def test_rewritten_rank_queries_have_no_global_window(spark, name):
    """The two queries the r12 verdict marked weak: distributed exact
    rank must keep the oracle hash (checked by the gate) AND drop the
    single-partition window (checked here)."""
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert unpartitioned_windows(df) == 0


def test_registry_wide_zero_unpartitioned_windows(spark):
    """Every registry entry's plan, built at sf0.001: zero empty
    partition specs anywhere. Catches regressions in ANY future query,
    not just the two historical offenders."""
    offenders = {}
    for name, qd in sorted(REGISTRY.items()):
        df = qd.fn(spark, SF_DIR)
        c = unpartitioned_windows(df)
        if c:
            offenders[name] = c
    assert offenders == {}, f"unpartitioned windows: {offenders}"
