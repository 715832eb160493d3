"""Parity tests for the per-connector webhook event specs against the
reference's documented ``from_payload``/``to_unified`` semantics
(connectors/warehouse_a/models.py:163-283,
connectors/hrflow/models.py:322-441)."""

from __future__ import annotations

import json

import pytest

from hrtech_etl_spark.operators.events import (
    CONNECTOR_EVENT_SPECS,
    parse_connector_events,
)


def _payload(entity, event_id="e1", etype=None, ts="2024-05-01T10:00:00", rid="r1"):
    p = {
        "id": event_id,
        "type": etype or f"{entity}.created",
        "data": {entity: {"id": rid}},
    }
    if ts is not None:
        p["timestamp"] = ts
    return json.dumps(p)


@pytest.mark.parametrize(
    "spec_name", ["warehouse_a.jobs", "hrflow.jobs", "warehouse_a.profiles"]
)
def test_type_mapping_parity(spark, spec_name):
    """created/updated/deleted map 1:1; EVERYTHING else — including
    '<entity>.archived' — falls to 'upserted' (the reference's
    to_unified has no archived branch)."""
    spec = CONNECTOR_EVENT_SPECS[spec_name]
    ent = spec.entity
    rows = [
        (_payload(ent, "e1", f"{ent}.created"),),
        (_payload(ent, "e2", f"{ent}.updated"),),
        (_payload(ent, "e3", f"{ent}.deleted"),),
        (_payload(ent, "e4", f"{ent}.archived"),),
        (_payload(ent, "e5", "totally.unknown"),),
    ]
    df = spark.createDataFrame(rows, ["raw"])
    got = {
        r["event_id"]: r["type"]
        for r in parse_connector_events(df, "raw", spec).collect()
    }
    assert got == {
        "e1": "created",
        "e2": "updated",
        "e3": "deleted",
        "e4": "upserted",
        "e5": "upserted",
    }


def test_malformed_payloads_dropped(spark):
    """from_payload returns None (→ drop) on: unparseable JSON, missing
    id/type/data.<entity>.id, unparseable timestamp. A MISSING
    timestamp is allowed (occurred_at null)."""
    spec = CONNECTOR_EVENT_SPECS["warehouse_a.jobs"]
    ok_no_ts = _payload("job", "keep1", ts=None)
    bad_ts = _payload("job", "drop_ts", ts="not-a-date")
    missing_rid = json.dumps({"id": "d2", "type": "job.created", "data": {}})
    missing_type = json.dumps({"id": "d3", "data": {"job": {"id": "r"}}})
    rows = [(ok_no_ts,), (bad_ts,), (missing_rid,), (missing_type,), ("{not json",)]
    df = spark.createDataFrame(rows, ["raw"])
    out = parse_connector_events(df, "raw", spec).collect()
    assert [r["event_id"] for r in out] == ["keep1"]
    assert out[0]["occurred_at"] is None
    assert json.loads(out[0]["payload"])["id"] == "keep1"


def test_parse_connector_events_on_a_real_stream(spark, tmp_path):
    """The same column plan runs on a streaming frame: webhook payload
    files → readStream text → parse_connector_events → availableNow
    drain; malformed rows drop mid-stream."""
    from hrtech_etl_spark.streaming.pipelines import run_available_now

    src = tmp_path / "webhooks"
    src.mkdir()
    lines = [
        _payload("job", "s1", "job.created"),
        _payload("job", "s2", "job.archived"),
        "{broken json",
    ]
    (src / "batch1.txt").write_text("\n".join(lines))

    spec = CONNECTOR_EVENT_SPECS["warehouse_a.jobs"]
    stream = spark.readStream.format("text").load(str(src))
    parsed = parse_connector_events(stream, "value", spec)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        run_available_now(
            parsed,
            checkpoint=str(tmp_path / "ck"),
            memory_table="webhook_events",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {r["event_id"]: r["type"] for r in spark.table("webhook_events").collect()}
    assert got == {"s1": "created", "s2": "upserted"}


def test_profile_events_carry_profile_id(spark):
    spec = CONNECTOR_EVENT_SPECS["hrflow.profiles"]
    df = spark.createDataFrame(
        [(_payload("profile", "p1", "profile.updated", rid="prof-9"),)], ["raw"]
    )
    row = parse_connector_events(df, "raw", spec).collect()[0]
    assert row["profile_id"] == "prof-9"
    assert row["type"] == "updated"
    assert row["occurred_at"] is not None
