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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def num_partitions(df: DataFrame) -> int:
    """Planned partition count of ``df``, computed WITHOUT running any
    job.

    ``df.rdd`` is only safe for exchange-free (scan-shaped) plans:
    under AQE — this engine's default — converting an exchange-bearing
    Dataset to an RDD materializes every intermediate query stage,
    i.e. silently EXECUTES the upstream shuffles at plan-build time.
    So: inspect the pre-adaptive physical plan (``sparkPlan``, a lazy
    tree — no execution); if it contains an Exchange, report the
    session's shuffle partition count (the post-shuffle width that
    plan will produce) instead of touching ``.rdd``. AQE may later
    coalesce below that estimate — acceptable: the CPU-heavy operators
    place their own pinned barriers after this probe.
    """
    qe = df._jdf.queryExecution()
    # executedPlan is where EnsureRequirements has inserted exchanges
    # (sparkPlan is pre-preparation and never shows them); toString on
    # an unexecuted adaptive plan prints the initial plan without
    # running anything.
    if "Exchange" not in qe.executedPlan().toString():
        return df.rdd.getNumPartitions()  # scan-shaped: no stages to run
    # exchange-bearing: an explicit repartition head declares its count
    # in the optimized logical plan; anything else gets the session
    # shuffle width (what the exchange will produce pre-AQE-coalesce).
    top = qe.optimizedPlan()
    if top.getClass().getSimpleName() in ("Repartition", "RepartitionByExpression"):
        try:
            return int(top.numPartitions())
        except Exception:  # noqa: BLE001 — unpinned repartition(col)
            pass
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
    projection into every consumer. The distinctness must survive WIDE
    inputs too: when the width dominates, the count is
    ``width + factor`` (a plain ``max(width, factor·base)`` would
    collapse every factor to the same ``width``, and the barrier-drop
    this guard exists for would reappear exactly at cluster scale).
    """
    base = n or df.sparkSession.sparkContext.defaultParallelism
    width = num_partitions(df)
    count = factor * base if width < factor * base else width + factor
    return df.repartition(count, *[F.col(c) for c in key_cols])
