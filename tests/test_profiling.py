"""Table profiler: correctness vs hand-computed stats, approx-mode
tolerance, and the one-scan plan shape."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.operators.profiling import PROFILE_COLUMNS, profile_table


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "en", 10),
        (2, "en", 20),
        (3, None, 20),
        (4, "fr", None),
        (5, "fr", 40),
    ]
    return spark.createDataFrame(rows, "id long, lang string, n long")


def test_exact_profile_values(df):
    out = {r["col_name"]: r for r in profile_table(df, exact=True).collect()}
    assert set(out) == {"id", "lang", "n"}
    assert tuple(profile_table(df).columns) == PROFILE_COLUMNS

    assert out["id"]["n_nonnull"] == 5
    assert out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 5
    assert (out["id"]["min_val"], out["id"]["max_val"]) == ("1", "5")

    assert out["lang"]["n_nonnull"] == 4
    assert out["lang"]["n_null"] == 1
    assert out["lang"]["n_distinct"] == 2
    assert (out["lang"]["min_val"], out["lang"]["max_val"]) == ("en", "fr")

    assert out["n"]["n_null"] == 1
    assert out["n"]["n_distinct"] == 3


def test_approx_profile_close(df):
    """HLL default: distinct counts within the published ~2% rsd (at
    these cardinalities: exact), everything else identical to exact."""
    exact = {r["col_name"]: r for r in profile_table(df, exact=True).collect()}
    approx = {r["col_name"]: r for r in profile_table(df).collect()}
    for c, e in exact.items():
        a = approx[c]
        assert (a["n_nonnull"], a["n_null"]) == (e["n_nonnull"], e["n_null"])
        assert (a["min_val"], a["max_val"]) == (e["min_val"], e["max_val"])
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(1, 0.05 * e["n_distinct"])


def test_column_subset_and_unknown(df):
    got = profile_table(df, ["lang"], exact=True).collect()
    assert [r["col_name"] for r in got] == ["lang"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_single_scan_plan(spark, sf_dir):
    """All columns' stats ride one scan: exactly one parquet FileScan
    in the plan, approx mode adds no Expand."""
    from hrtech_etl_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir)
    plan = (
        profile_table(docs, ["doc_id", "lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Expand" not in plan  # HLL path: no COUNT(DISTINCT) row blowup
    exact_plan = (
        profile_table(docs, ["doc_id", "lang"], exact=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert exact_plan.count("Scan parquet") == 1


def test_exotic_column_names(spark):
    """Spaces, dots, dashes and quotes are all legal Spark column
    names — the profiler must not leak them into identifiers."""
    df = (
        spark.range(3)
        .select(
            F.col("id").alias("n chars"),
            F.col("id").alias("a.b"),
            F.col("id").alias("it's"),
        )
    )
    out = {r["col_name"]: r for r in profile_table(df, exact=True).collect()}
    assert set(out) == {"n chars", "a.b", "it's"}
    assert out["a.b"]["n_distinct"] == 3


from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------------------------------------
# mad_outlier_stats
# ---------------------------------------------------------------------------


def test_mad_outliers_hand_checked(spark):
    """median/MAD stay put under contamination (the point of MAD) and
    the 3*MAD rule flags exactly the planted spikes."""
    from pyspark.sql import functions as F

    from hrtech_etl_spark.operators.profiling import mad_outlier_stats

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0, -900.0]
    # median = 12, deviations = [2,1,0,1,2,988,912] -> MAD = 2
    # threshold 3*2=6 -> outliers: 1000 and -900
    rows = [("a", v) for v in vals] + [("b", 5.0), ("b", None), (None, 1.0)]
    df = spark.createDataFrame(rows, ["grp", "value"])
    out = {r.grp: r for r in mad_outlier_stats(df, "grp", "value").collect()}
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a.n, a.median, a.mad, a.n_outliers) == (7, 12.0, 2.0, 2)
    assert abs(a.outlier_frac - round(2 / 7, 6)) < 1e-12
    b = out["b"]  # single value: MAD 0, nothing beyond 0 deviation
    assert (b.n, b.median, b.mad, b.n_outliers) == (1, 5.0, 0.0, 0)


def test_mad_beats_zscore_under_contamination(spark):
    """The same spike that hides from a 3-sigma z-score (it inflates
    sigma) is caught by 3*MAD."""
    from hrtech_etl_spark.operators.profiling import mad_outlier_stats

    vals = [float(v) for v in range(100, 121)] + [10_000.0] * 3
    df = spark.createDataFrame(
        [("a", v) for v in vals], ["grp", "value"]
    )
    row = mad_outlier_stats(df, "grp", "value").collect()[0]
    assert row.n_outliers == 3
    import statistics

    mu, sigma = statistics.mean(vals), statistics.pstdev(vals)
    z_flagged = sum(1 for v in vals if abs(v - mu) > 3 * sigma)
    assert z_flagged == 0, "z-score should MISS the spikes here"
