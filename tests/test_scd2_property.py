"""Property tests: scd2_from_changes against a pure-Python
reconstruction, and scd2_merge's fold equivalence, over random event
logs with timestamp ties and NULL attributes."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from hrtech_etl_spark.operators.scd import scd2_from_changes, scd2_merge

BASE = dt.datetime(2026, 1, 1)


def _py_scd2(rows):
    """Reference reconstruction: per key, runs of identical attr under
    (ts, eid) order; [valid_from, valid_to) intervals."""
    out = []
    by_key: dict = {}
    for k, attr, ts, eid in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        by_key.setdefault(k, []).append((attr, ts))
    for k, evs in by_key.items():
        runs = []
        for attr, ts in evs:
            if not runs or runs[-1][0] != attr:
                runs.append([attr, ts])
        for i, (attr, ts) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((k, attr, ts, nxt, nxt is None))
    return sorted(out, key=lambda r: (r[0], r[2], str(r[1])))


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=1, max_value=18))
    rows = []
    for eid in range(n):
        k = draw(st.integers(min_value=1, max_value=3))
        attr = draw(st.one_of(st.none(), st.sampled_from(["a", "b", "c"])))
        # coarse minutes force frequent same-key timestamp TIES, the
        # hardest ordering case (resolved by the eid tiebreak)
        ts = BASE + dt.timedelta(minutes=draw(st.integers(0, 5)))
        rows.append((k, attr, ts, eid))
    return rows


def _spark_rows(df):
    return sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in df.collect()
        ),
        key=lambda r: (r[0], r[2], str(r[1])),
    )


@settings(max_examples=15, deadline=None)
@given(rows=event_log())
def test_from_changes_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, eid long")
    got = _spark_rows(scd2_from_changes(df, "k", ["attr"], "ts", tiebreak_col="eid"))
    want = _py_scd2(rows)
    # compare ignoring duplicate-run ambiguity only when two runs tie
    # on (k, valid_from) — the python ref and the window agree because
    # both order by (ts, eid)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(rows=event_log(), cut=st.integers(min_value=0, max_value=17))
def test_merge_fold_equivalence(spark, rows, cut):
    """Splitting the log at any eid and folding the second half through
    scd2_merge must equal the full rebuild — PROVIDED the split is
    time-consistent (merge contract: batches arrive in event-time
    order), so we split on the (ts, eid) rank instead of raw eid.

    ``replay_safe=False`` is the exactly-once contract this property
    states: with the default replay dedup on, a same-instant flip-back
    split across batches (e.g. None→'a'→None all at one ts, cut inside
    the tie) is UNDECIDABLE from a checkpoint re-delivery — hypothesis
    found exactly that example — and the merge resolves it toward
    replay-no-op by design (see the scd2_merge docstring)."""
    ordered = sorted(rows, key=lambda r: (r[2], r[3]))
    first, second = ordered[: cut + 1], ordered[cut + 1 :]
    if not first or not second:
        return
    schema = "k long, attr string, ts timestamp, eid long"
    full = scd2_from_changes(
        spark.createDataFrame(ordered, schema), "k", ["attr"], "ts",
        tiebreak_col="eid",
    )
    dim0 = scd2_from_changes(
        spark.createDataFrame(first, schema), "k", ["attr"], "ts",
        tiebreak_col="eid",
    )
    merged = scd2_merge(
        dim0,
        spark.createDataFrame(second, schema),
        "k",
        ["attr"],
        "ts",
        tiebreak_col="eid",
        replay_safe=False,
    )
    assert _spark_rows(merged) == _spark_rows(full)


@settings(max_examples=10, deadline=None)
@given(rows=event_log(), cut=st.integers(min_value=0, max_value=17))
def test_merge_replay_noop_property(spark, rows, cut):
    """The other side of the replay_safe trade: with the default on,
    re-delivering the ENTIRE second batch to the already-merged table
    changes nothing — for every random log and split point."""
    ordered = sorted(rows, key=lambda r: (r[2], r[3]))
    first, second = ordered[: cut + 1], ordered[cut + 1 :]
    if not first or not second:
        return
    schema = "k long, attr string, ts timestamp, eid long"
    dim0 = scd2_from_changes(
        spark.createDataFrame(first, schema), "k", ["attr"], "ts",
        tiebreak_col="eid",
    )
    batch = spark.createDataFrame(second, schema)
    once = scd2_merge(dim0, batch, "k", ["attr"], "ts", tiebreak_col="eid")
    # materialize once: replaying into a lazily-recomputed frame would
    # re-randomize nothing here, but keeps the comparison honest
    once = once.localCheckpoint(eager=True)
    twice = scd2_merge(once, batch, "k", ["attr"], "ts", tiebreak_col="eid")
    assert _spark_rows(twice) == _spark_rows(once)
