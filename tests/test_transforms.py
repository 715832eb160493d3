"""Native↔unified canonical transforms: round-trips, fallbacks, edge
serialization."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hrtech_etl_spark.core.schemas import JOB_SCHEMA, PROFILE_SCHEMA
from hrtech_etl_spark.plans import transforms as tr


def _native_jobs(spark):
    rows = [
        ("j1", "Data Engineer", datetime(2024, 1, 1, 9), datetime(2024, 2, 1, 9), '{"a":1}'),
        ("j2", "ML Engineer", datetime(2024, 1, 5, 9), datetime(2024, 3, 1, 9), None),
    ]
    return spark.createDataFrame(rows, JOB_SCHEMA)


def test_job_roundtrip_preserves_native_fields(spark):
    native = _native_jobs(spark)
    back = tr.from_unified_job(tr.to_unified_job(native, origin="wh_a"))
    assert sorted(back.columns) == sorted(native.columns)
    got = {r["job_id"]: r for r in back.collect()}
    for r in native.collect():
        b = got[r["job_id"]]
        assert b["title"] == r["title"]
        assert b["created_at"] == r["created_at"]
        assert b["updated_at"] == r["updated_at"]
        assert b["payload"] == r["payload"]


def test_unified_job_shape_and_origin(spark):
    uni = tr.to_unified_job(_native_jobs(spark), origin="wh_a")
    row = uni.where(F.col("id") == "j1").first()
    assert row["key"] == "j1" and row["origin"] == "wh_a"
    assert row["name"] == "Data Engineer"
    assert row["skills"] is None  # typed null, not missing column
    assert "skills" in uni.columns and "ranges_float" in uni.columns


def test_denormalize_fallbacks(spark):
    uni = tr.to_unified_job(_native_jobs(spark), origin="wh_a")
    # id missing -> key; created_at missing -> updated_at
    degraded = uni.withColumn("id", F.lit(None).cast("string")).withColumn(
        "created_at", F.lit(None).cast("timestamp")
    )
    back = tr.from_unified_job(degraded)
    row = back.where(F.col("job_id") == "j1").first()
    assert row is not None  # id fell back to key
    assert row["created_at"] == row["updated_at"]


def test_profile_roundtrip(spark):
    rows = [
        ("p1", "Ada Lovelace", datetime(2024, 1, 1), datetime(2024, 2, 1), None),
    ]
    native = spark.createDataFrame(rows, PROFILE_SCHEMA)
    uni = tr.to_unified_profile(native, origin="wh_a")
    assert uni.first()["info"]["full_name"] == "Ada Lovelace"
    back = tr.from_unified_profile(uni)
    assert back.first()["full_name"] == "Ada Lovelace"


def test_rest_edge_iso_serialization(spark):
    uni = tr.to_unified_job(_native_jobs(spark), origin="wh_a")
    edge = tr.to_rest_edge(uni)
    row = edge.where(F.col("id") == "j1").first()
    assert row["updated_at"] == "2024-02-01T09:00:00"
    assert dict(edge.dtypes)["created_at"] == "string"
