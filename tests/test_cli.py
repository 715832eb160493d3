"""CLI + connector registry: pull/push end-to-end over testdata
parquet, checkpointed resume, registry resolution."""

from __future__ import annotations

import json

import pytest

from hrtech_etl_spark import cli
from hrtech_etl_spark.connectors import (
    ConnectorMeta,
    TableConnector,
    get_connector_instance,
    register_connector,
)

SF_DIR = "/root/testdata/sf0.001"


def test_registry_resolution(tmp_path):
    register_connector(
        ConnectorMeta(
            name="wh_test",
            factory=lambda: TableConnector(root=str(tmp_path), fmt="parquet"),
        )
    )
    inst = get_connector_instance("wh_test")
    assert isinstance(inst, TableConnector)
    # paths resolve as ad-hoc parquet connectors; unknown names raise
    assert isinstance(get_connector_instance(str(tmp_path)), TableConnector)
    with pytest.raises(KeyError):
        get_connector_instance("never_registered")


def test_cli_pull_with_resume(spark, tmp_path, capsys):
    origin_root = str(tmp_path / "origin")
    target_root = str(tmp_path / "target")
    state_dir = str(tmp_path / "state")
    # stage: orders as the 'jobs' resource of the origin warehouse
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.write.parquet(f"{origin_root}/jobs")

    argv = [
        "pull",
        "--resource", "job",
        "--origin", origin_root,
        "--target", target_root,
        "--cursor-col", "o_orderdate",
        "--uid-col", "o_orderkey",
        "--where", json.dumps([{"field": "o_orderstatus", "op": "eq", "value": "O"}]),
        "--formatter", json.dumps(
            [
                {"from": "o_orderkey", "to": "key"},
                {"from": "o_orderdate", "to": "updated_at"},
                {"from": "o_totalprice", "to": "price"},
            ]
        ),
        "--state-dir", state_dir,
        "--pipeline-key", "orders_job",
    ]
    assert cli.main(argv, spark=spark) == 0
    cur1 = json.loads(capsys.readouterr().out.strip())
    want = orders.where("o_orderstatus = 'O'").count()
    got = spark.read.parquet(f"{target_root}/jobs")
    assert got.count() == want
    assert set(got.columns) == {"key", "updated_at", "price"}
    assert cur1["end"] is not None and cur1["end_uid"] is not None

    # second run resumes from the checkpoint: nothing new to consume
    assert cli.main(argv, spark=spark) == 0
    cur2 = json.loads(capsys.readouterr().out.strip())
    assert spark.read.parquet(f"{target_root}/jobs").count() == want
    # empty slice leaves the resume point unchanged
    assert (cur2["end"], cur2["end_uid"]) in (
        (None, None),
        (cur1["end"], cur1["end_uid"]),
    )


def test_cli_push_metrics(spark, tmp_path, capsys):
    origin_root = str(tmp_path / "origin")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").write.parquet(
        f"{origin_root}/jobs"
    )
    argv = [
        "push",
        "--resource", "job",
        "--origin", origin_root,
        "--having", json.dumps([{"field": "o_totalprice", "op": "gt", "value": 100000}]),
        "--dry-run",
    ]
    assert cli.main(argv, spark=spark) == 0
    metrics = json.loads(capsys.readouterr().out.strip())
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert metrics["total_resources"] == orders.count()
    assert metrics["total_resources_pushed"] == orders.where(
        "o_totalprice > 100000"
    ).count()
    assert (
        metrics["skipped_having"]
        == metrics["total_resources"] - metrics["total_resources_pushed"]
    )


def test_cli_push_events_mode_all_counters(spark, tmp_path, capsys):
    # EVENTS-mode push through the CLI (reference core/pipeline.py:
    # 121-178 driven by push --mode events): last-wins dedup, missing
    # lookup, having filter, target write — all four PushResult
    # counters asserted, mirroring the reference API contract
    # (connectors/warehouse_a/test.py:206-243).
    origin_root = str(tmp_path / "origin")
    target_root = str(tmp_path / "target")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.write.parquet(f"{origin_root}/jobs")

    rows = orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").take(50)
    key_hi = next(r["o_orderkey"] for r in rows if r["o_totalprice"] > 100000)
    key_lo = next(r["o_orderkey"] for r in rows if r["o_totalprice"] <= 100000)
    key_missing = max(r["o_orderkey"] for r in rows) + 10_000_000

    events = [
        # duplicate pair for key_hi -> last-wins keeps ONE
        {"job_id": key_hi, "event_id": 1},
        {"job_id": key_hi, "event_id": 2},
        {"job_id": key_lo, "event_id": 3},
        {"job_id": key_missing, "event_id": 4},
    ]
    argv = [
        "push",
        "--resource", "job",
        "--origin", origin_root,
        "--target", target_root,
        "--mode", "events",
        "--events-json", json.dumps(events),
        "--resource-key", "o_orderkey",
        "--order-cols", "event_id",
        "--having", json.dumps(
            [{"field": "o_totalprice", "op": "gt", "value": 100000}]
        ),
    ]
    assert cli.main(argv, spark=spark) == 0
    metrics = json.loads(capsys.readouterr().out.strip())
    assert metrics["total_events"] == 4
    assert metrics["total_resources_fetched"] == 2  # hi + lo, deduped
    assert metrics["total_resources_pushed"] == 1   # only hi passes having
    assert metrics["skipped_missing"] == 1
    assert metrics["skipped_having"] == 1
    assert metrics["errors"] == []
    pushed = spark.read.parquet(f"{target_root}/jobs")
    assert pushed.count() == 1
    assert pushed.collect()[0]["o_orderkey"] == key_hi


def test_cli_push_events_requires_events_json(spark, tmp_path):
    origin_root = str(tmp_path / "origin")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(1).write.parquet(
        f"{origin_root}/jobs"
    )
    with pytest.raises(SystemExit):
        cli.main(
            ["push", "--resource", "job", "--origin", origin_root,
             "--mode", "events"],
            spark=spark,
        )


def test_cli_push_events_feed_order_tiebreak(spark, tmp_path, capsys):
    # Duplicate events with DIFFERENT payloads and no --order-cols: the
    # survivor must be the LAST occurrence in feed order (the
    # reference's dict-overwrite semantics, core/pipeline.py:141-143).
    # Before the __feed_seq__ tiebreak the default order was the
    # constant event key, leaving the survivor nondeterministic.
    origin_root = str(tmp_path / "origin")
    target_root = str(tmp_path / "target")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.write.parquet(f"{origin_root}/jobs")
    key = orders.select("o_orderkey").orderBy("o_orderkey").first()["o_orderkey"]

    events = [
        {"job_id": key, "note": "first"},
        {"job_id": key, "note": "second"},
        {"job_id": key, "note": "last"},
    ]
    argv = [
        "push",
        "--resource", "job",
        "--origin", origin_root,
        "--target", target_root,
        "--mode", "events",
        "--events-json", json.dumps(events),
        "--resource-key", "o_orderkey",
        # no --order-cols: feed position is the only tiebreak
    ]
    assert cli.main(argv, spark=spark) == 0
    metrics = json.loads(capsys.readouterr().out.strip())
    assert metrics["total_events"] == 3
    assert metrics["total_resources_pushed"] == 1
    pushed = spark.read.parquet(f"{target_root}/jobs")
    row = pushed.collect()[0]
    assert row["note"] == "last"
    # the internal feed-order column must not leak into the sink
    assert "__feed_seq__" not in pushed.columns


def test_cli_push_events_rejects_non_object_elements(spark, tmp_path):
    origin_root = str(tmp_path / "origin")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(1).write.parquet(
        f"{origin_root}/jobs"
    )
    with pytest.raises(SystemExit, match="not JSON objects"):
        cli.main(
            ["push", "--resource", "job", "--origin", origin_root,
             "--mode", "events",
             "--events-json", json.dumps([{"job_id": 1}, 42, "x"])],
            spark=spark,
        )


def test_cli_push_events_with_formatter(spark, tmp_path, capsys):
    # events mode + formatter: pushed rows are mapped before the
    # connector write (the reference's safe_format_resources step)
    origin_root = str(tmp_path / "origin")
    target_root = str(tmp_path / "target")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.write.parquet(f"{origin_root}/jobs")
    key = orders.select("o_orderkey").orderBy("o_orderkey").first()["o_orderkey"]

    argv = [
        "push",
        "--resource", "job",
        "--origin", origin_root,
        "--target", target_root,
        "--mode", "events",
        "--events-json", json.dumps([{"job_id": key, "event_id": 1}]),
        "--resource-key", "o_orderkey",
        "--order-cols", "event_id",
        "--formatter", json.dumps(
            [
                {"from": "o_orderkey", "to": "key"},
                {"from": "o_totalprice", "to": "price"},
            ]
        ),
    ]
    assert cli.main(argv, spark=spark) == 0
    metrics = json.loads(capsys.readouterr().out.strip())
    assert metrics["total_resources_pushed"] == 1
    pushed = spark.read.parquet(f"{target_root}/jobs")
    assert set(pushed.columns) == {"key", "price"}
    assert pushed.first()["key"] == key
