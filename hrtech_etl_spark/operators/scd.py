"""SCD Type-2 (slowly-changing dimension) operators.

The reference's sink is a last-wins MERGE (operators/upsert.py — its
semantics mirror /root/reference/src/hrtech_etl/core/pipeline.py's
PUT-then-POST upsert loop); SCD2 is the warehouse-standard extension
that KEEPS history: each attribute change closes the current version
row (``valid_to`` = change time) and opens a new one. Two operators:

- :func:`scd2_from_changes` — rebuild the full version history from an
  event log in one pass (change-point detection via lag over the key
  window; one shuffle on the key).
- :func:`scd2_merge` — apply ONE batch of updates to an existing SCD2
  table set-based (a single key-join, no per-row loop): close changed
  current rows, insert new versions, pass history and unchanged rows
  through untouched.

Equivalence contract (tested): folding an event log batch-by-batch
through ``scd2_merge`` produces exactly ``scd2_from_changes`` of the
whole log. At scale, pair ``scd2_merge`` with
``operators/upsert.py::merge_upsert``'s partition-scoped rewrite: a
day's updates rewrite only the partitions holding those keys' current
rows (history partitions are append-only and never touched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def scd2_from_changes(
    events: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
    _with_run_ordinal: bool = False,
) -> DataFrame:
    """Reconstruct the SCD2 version table from an event log: one row
    per (key, run of identical tracked attributes), ``valid_from`` =
    first event of the run, ``valid_to`` = start of the next run (NULL
    while current), ``is_current`` flagging the open version.

    Single key-partitioned window (ordered by ``ts_col`` then
    ``tiebreak_col`` for total order): lag detects change points, lead
    over the kept rows closes intervals. One shuffle total.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = W.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    marked = events.withColumn(
        "__chg", F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)).otherwise(changed)
    )
    runs = marked.where(F.col("__chg")).drop("__chg")
    out = runs.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        # run ordinal: total within-key order even when two runs share a
        # valid_from timestamp (same-ts changes under the tiebreak) —
        # scd2_merge's internal windows order by it; dropped from the
        # public result below.
        F.row_number().over(w).alias("__run"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return out if _with_run_ordinal else out.drop("__run")


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
    replay_safe: bool = True,
) -> DataFrame:
    """Apply one update batch to an SCD2 table, set-based.

    ``updates`` rows carry (key, attrs, ``ts_col``). Per key only the
    LATEST update in the batch decides the new current version —
    intermediate flip-flops within one batch are folded through
    :func:`scd2_from_changes` on the batch so within-batch history is
    kept too (each run of identical attrs becomes a version).

    Rules per key:
    - no existing current row → all batch versions insert;
    - batch's first change vs the current row's attrs → current row
      closes at that change's timestamp, batch versions insert;
    - batch equals current attrs (no change) → rows pass untouched
      (leading no-change runs are dropped from the batch);
    - late updates (strictly before the current row's ``valid_from``)
      are dropped — out-of-order feeds belong upstream in the
      event-time normalization, not silently rewriting closed history;
    - changes AT the current row's ``valid_from`` (a timestamp tie
      split across batches) version exactly as the full rebuild would,
      and — with ``replay_safe=True`` — EXACT re-deliveries (checkpoint
      replays) are no-ops: already-present (key, valid_from, attrs)
      versions anti-join away against the current tie cluster.

    ``replay_safe`` names an inherent ambiguity, not an optimization:
    version rows carry no event identity, so a batch change identical
    to an existing version in (key, valid_from, attrs) is formally
    UNDECIDABLE between a checkpoint re-delivery and a genuine
    same-instant flip-back (A→B→A inside one timestamp tie, split
    across batches). ``True`` (default) chooses at-least-once delivery
    safety: replays are no-ops, and the degenerate same-instant
    flip-back collapses (found by the fold-equivalence property test).
    ``False`` chooses exactly-once feeds: folding any time-consistent
    batch split equals the full rebuild — including same-instant
    flip-backs — but a re-delivered batch double-applies. Pick per
    your ingestion guarantee; every other rule is identical.

    One shuffle on the key for the batch window + one broadcast-or-
    shuffle key-join against the (small, current-only) head of the
    dimension; history rows stream through a union untouched.
    """
    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    # Fold the batch itself into SCD2 runs (handles multi-change
    # batches), then drop runs not after the key's current valid_from.
    # The private run ordinal keeps the internal windows TOTALLY
    # ordered even when two runs share a valid_from (same-timestamp
    # changes separated only by the tiebreak).
    batch = scd2_from_changes(
        updates,
        key_col,
        attr_cols,
        ts_col,
        tiebreak_col=tiebreak_col,
        _with_run_ordinal=True,
    )
    cur_k = cur.select(
        F.col(key_col),
        F.col("valid_from").alias("__cur_from"),
        *[F.col(c).alias(f"__cur_{c}") for c in attr_cols],
    )
    # Strictly-earlier runs are late data and drop; runs AT the current
    # version's start keep flowing — a same-timestamp change from a
    # later batch (tie split across the boundary) must version exactly
    # as the full rebuild would.
    b = batch.join(cur_k, key_col, "left")
    b = b.where(
        F.col("__cur_from").isNull() | (F.col("valid_from") >= F.col("__cur_from"))
    )
    if replay_safe:
        # Exact-replay idempotency, two signatures anti-joined away:
        # (a) the batch run already exists as a version row at the same
        #     (key, valid_from, attrs) — a re-delivered insert;
        # (b) the batch run's attrs equal the version CLOSED exactly at
        #     the run's valid_from — the re-delivered leading
        #     no-change run, which the first apply dropped without
        #     leaving a version row; when its timestamp tied the close
        #     boundary, the late-filter above can't catch the replay.
        # Outside instant ties (b) never fires on genuine changes (a
        # version closed at T implies another change AT T); inside
        # ties it resolves the documented undecidability toward
        # replays. The existing side stays bounded per key to the
        # current tie cluster plus the one boundary-closed version
        # (valid_to never exceeds the current version's start), so
        # this is a small join, not a scan of full history.
        recent = dim.join(
            cur_k.select(key_col, "__cur_from"), key_col
        ).where(
            (F.col("valid_from") >= F.col("__cur_from"))
            | (F.col("valid_to") >= F.col("__cur_from"))
        )
        dup_cond = (b[key_col] == recent[key_col]) & (
            (b["valid_from"] == recent["valid_from"])
            | (recent["valid_to"] == b["valid_from"])
        )
        for c in attr_cols:
            dup_cond = dup_cond & b[c].eqNullSafe(recent[c])
        b = b.join(recent, dup_cond, "left_anti")
    # Drop the leading no-change run: its attrs equal the current row's.
    first_w = W.partitionBy(key_col).orderBy("valid_from", "__run")
    same_as_cur = F.lit(True)
    for c in attr_cols:
        same_as_cur = same_as_cur & F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    b = (
        b.withColumn("__rn", F.row_number().over(first_w))
        .where(
            ~(
                (F.col("__rn") == 1)
                & F.col("__cur_from").isNotNull()
                & same_as_cur
            )
        )
        .drop("__rn", "__cur_from", *[f"__cur_{c}" for c in attr_cols])
    )
    # Re-close the batch's intervals after the drop (the dropped
    # leading run's close time belongs to the run that replaced it).
    inserts = (
        b.select(
            key_col,
            *attr_cols,
            "valid_from",
            F.lead("valid_from").over(first_w).alias("valid_to"),
            "__run",
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )

    # Close current rows whose key received at least one insert. No
    # forced broadcast: first_new is one row per batch key — small for
    # a CDC trickle, unbounded for a backfill batch — so AQE picks
    # broadcast only when it actually fits (the docstring's
    # "broadcast-or-shuffle" contract, decided at runtime).
    first_new = inserts.groupBy(key_col).agg(
        F.min("valid_from").alias("__close_at")
    )
    closed_or_kept = (
        cur.join(first_new, key_col, "left")
        .withColumn(
            "valid_to",
            F.when(F.col("__close_at").isNotNull(), F.col("__close_at")).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.col("__close_at").isNull())
        .drop("__close_at")
    )
    cols = [key_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(*cols)
        .unionByName(closed_or_kept.select(*cols))
        .unionByName(inserts.select(*cols))
    )


def as_of(dim: DataFrame, ts, *, ts_col_cast: str = "timestamp") -> DataFrame:
    """Point-in-time view of an SCD2 table: the version row valid AT
    ``ts`` per key — ``valid_from <= ts < valid_to`` with the open
    version's NULL ``valid_to`` meaning 'still current'. A pure filter
    (partition-prunable when the table is stored partitioned on
    ``valid_from`` date), so time travel over the dimension costs one
    scan of the relevant partitions."""
    t = F.lit(ts).cast(ts_col_cast)
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the dimension VERSION valid at the fact's
    event time — the canonical way an SCD2 table is consumed ("what
    was this user's plan when the purchase happened?"): key equality
    plus containment in ``[valid_from, valid_to)``, the open current
    version matching everything from its start.

    Output: all fact columns plus the dimension's attribute columns
    (everything except the key and the validity machinery). Attribute
    names colliding with fact columns raise up front — silent
    duplicate columns break every downstream select.

    Plan shape: a key-equi join with the validity range as a residual
    predicate — Spark hashes on the key and evaluates the range per
    key group, so the shuffle is the same one a plain dimension join
    pays; versions-per-key is the only row multiplier. At warehouse
    scale, bucket/sort both sides on the key to make it co-located,
    and partition the dimension on ``valid_from`` dates so snapshots
    prune (:func:`as_of` notes the same layout).
    """
    attr_cols = [
        c
        for c in dim.columns
        if c not in (key_col, "valid_from", "valid_to", "is_current")
    ]
    clash = [c for c in attr_cols if c in facts.columns]
    if clash:
        raise ValueError(
            f"temporal_join: dimension attribute(s) {clash} collide with "
            "fact columns — alias one side first"
        )
    f = facts.alias("f")
    d = dim.alias("d")
    cond = (
        (F.col(f"f.{key_col}") == F.col(f"d.{key_col}"))
        & (F.col(f"f.{ts_col}") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col(f"f.{ts_col}") < F.col("d.valid_to")))
    )
    return f.join(d, cond, how).select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}") for c in attr_cols],
    )
