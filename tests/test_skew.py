"""Salted operators must equal their direct (unsalted) counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.operators import skew

SF_DIR = "/root/testdata/sf0.001"


def test_salted_sum_count_equals_direct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (round(r["sum_l_quantity"], 2), r["n"])
        for r in skew.salted_sum_count(
            li, ["l_returnflag"], "l_quantity", salt_col="l_orderkey"
        ).collect()
    }
    want = {
        r["l_returnflag"]: (round(r["s"], 2), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_salted_count_distinct_equals_direct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["n_distinct_l_orderkey"]
        for r in skew.salted_count_distinct(
            li, ["l_returnflag"], "l_orderkey"
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_direct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = skew.salted_join(
        li, orders, "l_orderkey", fact_unique_col="l_linenumber", n_salts=4
    )
    want = li.join(orders, "l_orderkey")
    assert got.count() == want.count()
    g = got.agg(F.sum("l_quantity")).first()[0]
    w = want.agg(F.sum("l_quantity")).first()[0]
    assert abs(g - w) < 1e-6


def test_bucketed_range_join_equals_theta(spark):
    """Pure range join via bucketization == the naive theta join."""
    from pyspark.sql import functions as F

    from hrtech_etl_spark.operators.joins import bucketed_range_join

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where("l_shipdate >= '1995-03-01' and l_shipdate < '1995-03-08'")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where("o_orderpriority = '1-URGENT'")
        .select("o_orderkey", "o_orderdate")
    )
    start = F.col("o_orderdate").cast("timestamp")
    end = start + F.expr("INTERVAL 36 HOURS")
    point = F.col("l_shipdate").cast("timestamp")
    got = bucketed_range_join(
        li, o, left_point=point, right_start=start, right_end=end,
        bucket_seconds=86400,
    )
    want = li.join(o, (point >= start) & (point <= end))
    assert got.count() == want.count()
    # exact pair-set equality, not just counts
    key = ["l_orderkey", "l_linenumber", "o_orderkey"]
    assert got.select(key).exceptAll(want.select(key)).count() == 0
    assert want.select(key).exceptAll(got.select(key)).count() == 0
