

def test_interval_overlap_join_vs_bruteforce(spark):
    """Grid-bucketed overlap join equals the quadratic predicate join,
    including boundary cases (touching intervals do NOT overlap under
    half-open semantics)."""
    from hrtech_etl_spark.operators.joins import interval_overlap_join
    from pyspark.sql import functions as F

    lrows = [(i, float(s), float(s + d)) for i, (s, d) in enumerate(
        [(0, 10), (5, 3), (100, 50), (149, 2), (151, 10), (200, 1)]
    )]
    rrows = [(i, float(s), float(s + d)) for i, (s, d) in enumerate(
        [(8, 4), (12, 1), (120, 100), (150, 1), (201, 5), (999, 1)]
    )]
    ldf = spark.createDataFrame(lrows, "lid long, ls double, le double")
    rdf = spark.createDataFrame(rrows, "rid long, rs double, re double")
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf,
            left_start=F.col("ls"), left_end=F.col("le"),
            right_start=F.col("rs"), right_end=F.col("re"),
            bucket_seconds=7,
        ).collect()
    }
    expect = {
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls < re and rs < le
    }
    assert got == expect
    # touching pair (200,201)x(201,206) must be absent (half-open)
    assert (5, 4) not in got
