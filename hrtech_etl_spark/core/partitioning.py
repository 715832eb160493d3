"""Scale-conditional partitioning helpers.

Every CPU-heavy operator in this engine (shingling, minhash folds,
vector math) wants enough input partitions to keep all cores busy —
but ONLY when the scan is narrow. A single small parquet file scans as
ONE task no matter how many cores exist (file/row-group granularity),
so per-row-expensive expressions serialize without a repartition. At
corpus scale the opposite holds: a 100 TB scan already yields
thousands of tasks, and an unconditional round-robin exchange is a
full extra pass over the data that moves everything and changes
nothing. The helpers here widen narrow inputs and are identities (or
width-preserving) on wide ones, so the same operator code is right at
both ends.

Partition counts are always pinned explicitly: with a bare
``repartition(col)`` AQE sees a few MB of shuffle data and coalesces
back to one partition — correct for IO-bound plans, wrong where cost
is per-row CPU, and it would serialize the heavy stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _declared_repartition_count(plan) -> int | None:
    """Walk the optimized logical plan downward through width-preserving
    nodes (Project/Filter) to the nearest explicit repartition and
    return its declared count. Chained-barrier plans look like
    ``Project(Filter(RepartitionByExpression(...)))`` — only checking
    the TOP node (the old behavior) missed the declared count whenever
    a projection sat above the barrier, collapsing the estimate to the
    session shuffle conf and re-enabling same-key same-count barrier
    collisions. Any other node (join, aggregate, window) changes the
    width, so the walk stops there."""
    node = plan
    while True:
        name = node.getClass().getSimpleName()
        if name in ("Repartition", "RepartitionByExpression"):
            try:
                return int(node.numPartitions())
            except Exception:  # noqa: BLE001 — unpinned repartition(col)
                return None
        if name in ("Project", "Filter") and node.children().size() == 1:
            node = node.children().apply(0)
            continue
        return None


def num_partitions(df: DataFrame) -> int:
    """Planned partition count of ``df``, computed WITHOUT running any
    job.

    ``df.rdd`` is only safe for exchange-free (scan-shaped) plans:
    under AQE — this engine's default — converting an exchange-bearing
    Dataset to an RDD materializes every intermediate query stage,
    i.e. silently EXECUTES the upstream shuffles (and broadcasts) at
    plan-build time. So: inspect the unexecuted physical plan string;
    exchange-bearing plans are estimated from the plan instead of
    touching ``.rdd``:

    - nearest explicit repartition head (through Project/Filter):
      its DECLARED count — exact, covers chained keyed barriers;
    - otherwise: the session shuffle partition count (what a shuffle
      will produce pre-AQE-coalesce; for broadcast-ONLY plans a
      documented estimate — the true width is the streamed side's,
      and materializing the broadcast to learn it IS running a job).

    AQE may later coalesce below these estimates — acceptable: the
    CPU-heavy operators place their own pinned barriers after this
    probe.
    """
    qe = df._jdf.queryExecution()
    # executedPlan is where EnsureRequirements has inserted exchanges
    # (sparkPlan is pre-preparation and never shows them); toString on
    # an unexecuted adaptive plan prints the initial plan without
    # running anything.
    plan_str = qe.executedPlan().toString()
    if "Exchange" not in plan_str:
        return df.rdd.getNumPartitions()  # scan-shaped: no stages to run
    declared = _declared_repartition_count(qe.optimizedPlan())
    if declared is not None:
        return declared
    # shuffle-bearing: the session conf is what the exchange produces
    # pre-AQE-coalesce. Broadcast-ONLY plans get the same conf value —
    # their true width is the streamed side's, unknowable here without
    # executing the broadcast — so the conf is a documented estimate
    # there, and the spread/barrier callers tolerate overestimates
    # (worst case: one redundant repartition of a broadcast-join
    # output).
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to ``n`` (default: defaultParallelism)
    ahead of a CPU-heavy projection — ONLY when the input is narrower
    than that target.

    Narrow input (the single-file local case): the exchange costs a few
    MB and buys full-core parallelism for the expensive projection
    above it. Wide input (a cluster-scale scan): the exchange would be
    a full extra pass over the corpus, so it is skipped and ``df`` is
    returned unchanged — callers can rely on ``spread(df) is df`` when
    the input is already wide.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if num_partitions(df) >= n:
        return df
    return df.repartition(n)


def keyed_barrier(
    df: DataFrame, *key_cols: str, factor: int = 1, n: int | None = None
) -> DataFrame:
    """Hash-repartition on ``key_cols`` with a pinned, never-narrowing
    partition count.

    Used to materialize an expensive projection (minhash signatures,
    hashed shingle sets) behind ONE exchange that every downstream
    consumer — both sides of a self-join included — reads back as a
    ReusedExchange instead of recomputing. Unlike :func:`spread` this
    always exchanges (reuse is the point); the scale-awareness is that
    an already-wide input keeps (slightly exceeds) its width instead
    of being funneled down to the local-mode default. ``factor``
    exists so adjacent barriers in one plan get distinct counts — with
    the same key AND the same count, EnsureRequirements drops the
    second exchange as redundant and re-inlines the expensive
    projection into every consumer.

    The narrow branch uses ``factor · base`` EXACTLY (an even multiple
    of the core count → CPU-heavy stages run in full waves; measured
    A/B in one session at sf0.1, +factor breaking wave alignment cost
    the LSH pipeline ~25% wall-clock from a straggler wave of 2-3
    tasks); the wide branch appends ``+ factor`` for distinctness.
    Chained same-key barriers cannot collide across branches because
    ``num_partitions`` reads the inner barrier's DECLARED count
    through Project/Filter: barrier B over barrier A sees width
    exactly ``count_A``, and both branches then yield
    ``count_B > count_A`` (base branch: it is only taken when
    ``count_A < factor_B · base``; wide branch: ``count_A + factor_B``).
    The historical collision (raw ``W+2`` == conf ``S+3``) required the
    width of A to be MISestimated via the session conf — possible now
    only when a width-changing node (join/agg/window) sits between the
    barriers, and such a node inserts its own exchange there anyway.
    """
    base = n or df.sparkSession.sparkContext.defaultParallelism
    width = num_partitions(df)
    count = factor * base if width < factor * base else width + factor
    return df.repartition(count, *[F.col(c) for c in key_cols])


def bounded_window_key(col) -> Column:
    """Non-foldable always-zero partition key for window specs over
    KNOB-BOUNDED frames (shard totals, bucket offsets — frames whose
    row count is a parameter like ``n_shards``/``n_buckets``, never the
    data).

    Semantically this is one partition — ``pmod(hash(c), 1) = 0`` for
    every row — but it is a DECLARED partitionSpec the optimizer cannot
    constant-fold away (a bare ``lit(0)`` gets folded and the spec
    comes out EMPTY). The repo-wide plan contract
    (tests/test_window_contract.py) bans empty partition specs because
    they are indistinguishable from an accidental move-everything
    global window; this marker is the explicit, greppable opt-in for
    the bounded case.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(1))


def unpartitioned_windows(df: DataFrame) -> int:
    """Count Window/WindowGroupLimit nodes with an EMPTY partitionSpec
    in the OPTIMIZED logical plan — the plan shape that moves every
    row to one partition (``WindowExec: No Partition Defined``),
    invisible at test SFs and fatal at 100 TB. Post-constant-folding
    on purpose: a foldable partition key that optimizes away counts as
    unpartitioned, which is exactly why :func:`bounded_window_key` is
    non-foldable. ONE definition shared by the repo-wide plan-contract
    test (tests/test_window_contract.py) and the rank scale smoke
    (tools/scale_smoke.py)."""
    n = [0]

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in ("Window", "WindowGroupLimit") and node.partitionSpec().isEmpty():
            n[0] += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return n[0]
