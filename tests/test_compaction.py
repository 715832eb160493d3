"""Compaction: many small files → few right-sized files, data intact."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.operators.compaction import (
    compact,
    data_file_count,
    dataset_bytes,
)

SF_DIR = "/root/testdata/sf0.001"


def test_compact_flat_dataset(spark, tmp_path):
    path = str(tmp_path / "frag")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.repartition(40).write.parquet(path)  # fragment: 40 small files
    assert data_file_count(path) >= 40
    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg(F.sum("l_quantity")).first()[0]

    n = compact(spark, path, target_file_mb=128)
    assert n < 40  # tiny dataset → collapses to ~1 file
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert abs(after.agg(F.sum("l_quantity")).first()[0] - before_sum) < 1e-6


def test_compact_partitioned_dataset(spark, tmp_path):
    path = str(tmp_path / "pfrag")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    o.repartition(20).write.partitionBy("status").parquet(path)
    frag_count = data_file_count(path)
    before = spark.read.parquet(path).count()

    n = compact(spark, path, target_file_mb=128, partition_by=["status"])
    assert n < frag_count
    got = spark.read.parquet(path)
    assert got.count() == before
    # partition layout preserved
    assert (tmp_path / "pfrag" / "status=O").exists()
