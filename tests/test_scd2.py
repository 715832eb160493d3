"""SCD2: batch-fold equivalence with the full rebuild, and merge edge
cases (new key, no-change batch, within-batch flip-flop, late update)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.scd import scd2_from_changes, scd2_merge


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


SCHEMA = "k long, attr string, ts timestamp, eid long"


def _sorted_rows(df):
    return sorted(
        (
            r["k"],
            r["attr"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in df.collect()
    )


def test_from_changes_runs(spark):
    events = spark.createDataFrame(
        [
            (1, "a", _ts(1), 1),
            (1, "a", _ts(2), 2),   # no change — same run
            (1, "b", _ts(3), 3),   # change
            (1, "a", _ts(4), 4),   # change back — NEW version
            (2, "x", _ts(5), 5),
        ],
        SCHEMA,
    )
    out = _sorted_rows(
        scd2_from_changes(events, "k", ["attr"], "ts", tiebreak_col="eid")
    )
    assert out == [
        (1, "a", _ts(1), _ts(3), False),
        (1, "a", _ts(4), None, True),
        (1, "b", _ts(3), _ts(4), False),
        (2, "x", _ts(5), None, True),
    ]


def test_merge_equals_full_rebuild(spark, sf_dir):
    """Folding the event log through scd2_merge in two batches must
    equal scd2_from_changes over the whole log."""
    from hrtech_etl_spark.sources.testdata import load_table

    e = load_table(spark, "events", sf_dir).select(
        F.col("user_id").alias("k"),
        F.col("event_type").alias("attr"),
        "ts",
        F.col("event_id").alias("eid"),
    )
    cutoff = e.approxQuantile("eid", [0.5], 0.0)[0]
    first, second = e.where(F.col("eid") <= cutoff), e.where(F.col("eid") > cutoff)

    full = scd2_from_changes(e, "k", ["attr"], "ts", tiebreak_col="eid")
    dim0 = scd2_from_changes(first, "k", ["attr"], "ts", tiebreak_col="eid")
    merged = scd2_merge(dim0, second, "k", ["attr"], "ts", tiebreak_col="eid")
    assert _sorted_rows(merged) == _sorted_rows(full)


@pytest.fixture()
def dim(spark):
    events = spark.createDataFrame(
        [(1, "a", _ts(1), 1), (2, "x", _ts(1), 2)], SCHEMA
    )
    return scd2_from_changes(events, "k", ["attr"], "ts", tiebreak_col="eid")


def test_merge_new_key(spark, dim):
    upd = spark.createDataFrame([(3, "z", _ts(5), 9)], SCHEMA)
    out = _sorted_rows(scd2_merge(dim, upd, "k", ["attr"], "ts", tiebreak_col="eid"))
    assert (3, "z", _ts(5), None, True) in out
    assert (1, "a", _ts(1), None, True) in out  # untouched


def test_merge_no_change_batch(spark, dim):
    upd = spark.createDataFrame([(1, "a", _ts(6), 9)], SCHEMA)
    out = _sorted_rows(scd2_merge(dim, upd, "k", ["attr"], "ts", tiebreak_col="eid"))
    # same attr → no new version, current row stays open at the OLD ts
    assert out == _sorted_rows(dim)


def test_merge_flip_flop_batch(spark, dim):
    """Within-batch a→b→a keeps BOTH intermediate versions."""
    upd = spark.createDataFrame(
        [(1, "b", _ts(6), 9), (1, "a", _ts(7), 10)], SCHEMA
    )
    out = _sorted_rows(scd2_merge(dim, upd, "k", ["attr"], "ts", tiebreak_col="eid"))
    assert (1, "a", _ts(1), _ts(6), False) in out
    assert (1, "b", _ts(6), _ts(7), False) in out
    assert (1, "a", _ts(7), None, True) in out


def test_merge_drops_late_updates(spark, dim):
    """An update at or before the current row's valid_from is dropped."""
    upd = spark.createDataFrame([(1, "z", _ts(0), 9)], SCHEMA)
    out = _sorted_rows(scd2_merge(dim, upd, "k", ["attr"], "ts", tiebreak_col="eid"))
    assert out == _sorted_rows(dim)


def test_merge_same_timestamp_tie(spark, dim):
    """Two batch changes at the SAME timestamp: the tiebreak column
    decides run order, so the later-eid attr must win as current —
    deterministically, matching the full rebuild's (ts, eid) order."""
    upd = spark.createDataFrame(
        [(1, "b", _ts(5), 2), (1, "c", _ts(5), 3)], SCHEMA
    )
    out = _sorted_rows(scd2_merge(dim, upd, "k", ["attr"], "ts", tiebreak_col="eid"))
    assert (1, "c", _ts(5), None, True) in out
    assert (1, "b", _ts(5), _ts(5), False) in out

    events = spark.createDataFrame(
        [(1, "a", _ts(1), 1), (1, "b", _ts(5), 2), (1, "c", _ts(5), 3)], SCHEMA
    )
    full = _sorted_rows(
        scd2_from_changes(events, "k", ["attr"], "ts", tiebreak_col="eid")
    )
    merged = [r for r in out if r[0] == 1]
    assert merged == full


def test_as_of_point_in_time(spark):
    from hrtech_etl_spark.operators.scd import as_of

    events = spark.createDataFrame(
        [(1, "a", _ts(1), 1), (1, "b", _ts(3), 2), (2, "x", _ts(2), 3)],
        SCHEMA,
    )
    dim = scd2_from_changes(events, "k", ["attr"], "ts", tiebreak_col="eid")
    at2 = {r["k"]: r["attr"] for r in as_of(dim, _ts(2)).collect()}
    assert at2 == {1: "a", 2: "x"}
    at3 = {r["k"]: r["attr"] for r in as_of(dim, _ts(3)).collect()}
    assert at3 == {1: "b", 2: "x"}
    at0 = as_of(dim, _ts(0, 30)).count()
    assert at0 == 0  # before any version


def test_merge_tie_split_across_batches(spark, dim):
    """A same-timestamp change arriving in a LATER batch versions
    exactly as the full rebuild (zero-length closed version + new
    current), not silently dropped."""
    t = _ts(5)
    b1 = spark.createDataFrame([(1, "b", t, 2)], SCHEMA)
    b2 = spark.createDataFrame([(1, "c", t, 3)], SCHEMA)
    step1 = scd2_merge(dim, b1, "k", ["attr"], "ts", tiebreak_col="eid")
    step2 = scd2_merge(step1, b2, "k", ["attr"], "ts", tiebreak_col="eid")
    events = spark.createDataFrame(
        [(1, "a", _ts(1), 1), (1, "b", t, 2), (1, "c", t, 3),
         (2, "x", _ts(1), 4)],
        SCHEMA,
    )
    full = scd2_from_changes(events, "k", ["attr"], "ts", tiebreak_col="eid")
    assert _sorted_rows(step2) == _sorted_rows(full)


def test_merge_replay_idempotent(spark, dim):
    """Exactly-once for the streaming sink: re-applying ANY batch —
    including one containing a within-batch timestamp tie — is a
    no-op."""
    t = _ts(5)
    batch = spark.createDataFrame([(1, "b", t, 2), (1, "c", t, 3)], SCHEMA)
    once = scd2_merge(dim, batch, "k", ["attr"], "ts", tiebreak_col="eid")
    twice = scd2_merge(once, batch, "k", ["attr"], "ts", tiebreak_col="eid")
    assert _sorted_rows(once) == _sorted_rows(twice)


def test_temporal_join_selects_containing_version(spark):
    from hrtech_etl_spark.operators.scd import temporal_join
    import datetime as dt

    def t(m):
        return dt.datetime(2026, 1, 1, 0, m)

    dim = spark.createDataFrame(
        [
            (1, "bronze", t(0), t(10), False),
            (1, "gold", t(10), None, True),
            (2, "silver", t(5), None, True),
        ],
        "user_id long, plan string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, t(3)),    # inside bronze
            (101, 1, t(10)),   # exactly at boundary -> gold ([from, to))
            (102, 1, t(42)),   # open current version
            (103, 2, t(4)),    # before user 2's first version -> no match
        ],
        "fact_id long, user_id long, ts timestamp",
    )
    got = {
        r["fact_id"]: r["plan"]
        for r in temporal_join(facts, dim, "user_id", "ts").collect()
    }
    assert got == {100: "bronze", 101: "gold", 102: "gold"}
    # left join keeps the unmatched fact with NULL attrs
    left = {
        r["fact_id"]: r["plan"]
        for r in temporal_join(facts, dim, "user_id", "ts", how="left").collect()
    }
    assert left[103] is None and len(left) == 4


def test_temporal_join_rejects_column_collision(spark):
    from hrtech_etl_spark.operators.scd import temporal_join
    import datetime as dt

    dim = spark.createDataFrame(
        [(1, "x", dt.datetime(2026, 1, 1), None, True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )
    facts = spark.createDataFrame(
        [(1, "clash", dt.datetime(2026, 1, 2))], "k long, v string, ts timestamp"
    )
    with pytest.raises(ValueError, match="collide"):
        temporal_join(facts, dim, "k", "ts")
