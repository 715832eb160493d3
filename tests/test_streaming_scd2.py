"""CDC→SCD2 streaming sink: a REAL multi-micro-batch drain through
foreach_batch_scd2 must leave the parquet dimension equal to the full
rebuild over the whole event log."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.scd import scd2_from_changes
from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.streaming.pipelines import (
    foreach_batch_scd2,
    run_available_now,
)


@pytest.mark.parametrize("n_batches", [3])
def test_streamed_dim_equals_full_rebuild(spark, sf_dir, tmp_path, n_batches):
    events = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    # stage N time-ordered slices as separate files; maxFilesPerTrigger=1
    # turns them into N REAL micro-batches under availableNow
    stage = tmp_path / "stage"
    stage.mkdir()
    # slice by ts-ordered rank so batch k+1 is strictly later than k
    # (the merge's late-update contract expects time-ordered feeds)
    ranked = events.withColumn(
        "__rk", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    total = ranked.count()
    per = total // n_batches + 1
    for i in range(n_batches):
        part = ranked.where(
            (F.col("__rk") > i * per) & (F.col("__rk") <= (i + 1) * per)
        ).drop("__rk")
        part.coalesce(1).write.parquet(str(stage / f"slice_{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(stage))
    )
    dim_path = str(tmp_path / "dim")
    run_available_now(
        stream,
        checkpoint=str(tmp_path / "ck"),
        foreach_batch=foreach_batch_scd2(
            dim_path, "user_id", ["event_type"], "ts", tiebreak_col="event_id"
        ),
    )

    got = sorted(
        (
            r["user_id"],
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in spark.read.parquet(dim_path).collect()
    )
    want = sorted(
        (
            r["user_id"],
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in scd2_from_changes(
            events, "user_id", ["event_type"], "ts", tiebreak_col="event_id"
        ).collect()
    )
    assert got == want


def test_sink_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the swap's renames leaves the dimension in
    .__old — the next batch must restore it, not rebuild history from
    one micro-batch."""
    import datetime as dt
    import os

    from hrtech_etl_spark.streaming.pipelines import foreach_batch_scd2

    sink = foreach_batch_scd2(
        str(tmp_path / "dim"), "k", ["attr"], "ts", tiebreak_col="eid"
    )
    b1 = spark.createDataFrame(
        [(1, "a", dt.datetime(2026, 1, 1, 1), 1)],
        "k long, attr string, ts timestamp, eid long",
    )
    sink(b1, 0)
    # simulate the crash window: live target renamed away, stage lost
    os.rename(str(tmp_path / "dim"), str(tmp_path / "dim.__old"))
    b2 = spark.createDataFrame(
        [(1, "b", dt.datetime(2026, 1, 1, 2), 2)],
        "k long, attr string, ts timestamp, eid long",
    )
    sink(b2, 1)
    rows = sorted(
        (r["k"], r["attr"], r["is_current"])
        for r in spark.read.parquet(str(tmp_path / "dim")).collect()
    )
    # history from batch 1 survived the interrupted swap
    assert rows == [(1, "a", False), (1, "b", True)]


def test_dataset_exists_ignores_write_debris(spark, tmp_path):
    """A directory holding only _temporary debris from a killed write
    must NOT count as an existing dataset — the replayed batch has to
    re-bootstrap, not read a half-written table forever."""
    from hrtech_etl_spark.operators.upsert import _dataset_exists

    d = tmp_path / "dim"
    (d / "_temporary" / "0").mkdir(parents=True)
    assert not _dataset_exists(spark, str(d))
    # a committed part file flips it
    (d / "part-00000-abc.snappy.parquet").write_bytes(b"PAR1")
    assert _dataset_exists(spark, str(d))
