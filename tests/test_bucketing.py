"""Bucketed co-located joins: no Exchange on either side, results
equal the plain join."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.operators import bucketing as bk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    bk.write_bucketed(
        li, "bk_li", bucket_col="l_orderkey", n_buckets=4,
        path=str(tmp_path / "bk_li"),
    )
    bk.write_bucketed(
        o, "bk_o", bucket_col="l_orderkey", n_buckets=4,
        path=str(tmp_path / "bk_o"),
    )
    yield "bk_li", "bk_o"
    spark.sql("DROP TABLE IF EXISTS bk_li")
    spark.sql("DROP TABLE IF EXISTS bk_o")


def test_bucketed_join_no_shuffle_and_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bk.bucketed_join(spark, left, right, on="l_orderkey")
    bk.assert_no_shuffle_join(joined)  # co-located: zero Exchange
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .count()
    )
    assert joined.count() == want
