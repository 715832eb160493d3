"""Fuzzy edit-distance join: exact recall vs brute-force levenshtein,
d=2 blocking, length guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.fuzzy import delete_variants, edit_distance_pairs

NAMES = [
    (1, "smith"),
    (2, "smyth"),     # substitution (d=1 of smith)
    (3, "smiths"),    # insertion (d=1 of smith)
    (4, "mith"),      # deletion (d=1 of smith)
    (5, "smithy"),    # d=1 of smith, d=2 of smyth
    (6, "jones"),     # unrelated
    (7, "sm"),        # short string edge
    (8, "smith"),     # exact duplicate of 1 (d=0)
]


def _brute(spark, df, d):
    a, b = df.alias("a"), df.alias("b")
    return {
        (r["id_a"], r["id_b"], r["distance"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.name", "b.name").alias("distance"),
        )
        .where(F.col("distance") <= d)
        .collect()
    }


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(NAMES, "id long, name string")


@pytest.mark.parametrize("d", [1, 2])
def test_exact_recall_vs_brute_force(spark, names, d):
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_pairs(
            names, "name", "id", max_distance=d
        ).collect()
    }
    assert got == _brute(spark, names, d)


def test_variant_counts(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    v1 = df.select(delete_variants(F.col("s")).alias("v")).collect()[0]["v"]
    assert sorted(v1) == ["ab", "abc", "ac", "bc"]
    v2 = df.select(
        delete_variants(F.col("s"), max_distance=2).alias("v")
    ).collect()[0]["v"]
    # + single chars from double deletes
    assert set(v2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}


def test_max_len_guard(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "id long, name string")
    with pytest.raises(Exception, match="max_len"):
        edit_distance_pairs(df, "name", "id", max_len=64).collect()


def test_null_keys_skipped(spark):
    """NULL keys are routine in entity data: they must be skipped (a
    NULL can never match), never crash the job."""
    df = spark.createDataFrame(
        [(1, "smith"), (2, None), (3, "smyth")], "id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "name", "id").collect()
    }
    assert got == {(1, 3)}
