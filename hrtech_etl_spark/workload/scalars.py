"""Declared queries: scalar function families (string, date, math,
array, json) — SURVEY.md §2.7/§2.10.

Each family is exercised inside an aggregation so outputs stay small
and hash-stable while the scalar work runs over the full table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import dec, dsum, query, sql_dsum


@query(
    "scalar_string_funcs",
    sql="""
    SELECT first_word,
           count(*) AS n,
           CAST(min(name_len) AS INT) AS min_len,
           CAST(max(name_len) AS INT) AS max_len,
           min(upper_brand) AS first_brand
    FROM (
      SELECT regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
             length(p_name) AS name_len,
             upper(p_brand) AS upper_brand
      FROM part
      WHERE substr(p_name, 1, 1) BETWEEN 'a' AND 'z'
    ) GROUP BY first_word
    """,
)
def scalar_string_funcs(spark, sf_dir):
    """upper/length/substr/regexp_extract — all codegen'd string ops."""
    p = load_table(spark, "part", sf_dir)
    derived = p.where(F.substring("p_name", 1, 1).between("a", "z")).select(
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("upper_brand"),
    )
    return derived.groupBy("first_word").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("name_len").alias("min_len"),
        F.max("name_len").alias("max_len"),
        F.min("upper_brand").alias("first_brand"),
    )


@query(
    "scalar_date_funcs",
    sql=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(date_part('year', o_orderdate) AS INT) AS order_year,
           CAST(date_part('quarter', o_orderdate) AS INT) AS order_quarter,
           count(*) AS n,
           {sql_dsum("o_totalprice")} AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def scalar_date_funcs(spark, sf_dir):
    """date_trunc/year/quarter extraction — monthly revenue rollup, the
    canonical partition-pruned time-series scan."""
    o = load_table(spark, "orders", sf_dir).where(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
    )
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))


@query(
    "scalar_math_funcs",
    sql="""
    SELECT l_returnflag AS returnflag,
           CAST(round(sum(round(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)), 2)), 2) AS DOUBLE) AS discount_total,
           max(round(sqrt(CAST(l_quantity AS DOUBLE)), 6)) AS max_sqrt_qty,
           min(abs(CAST(l_quantity AS DOUBLE) - 25.0)) AS min_abs_dev,
           CAST(max(floor(CAST(l_extendedprice AS DOUBLE) / 10000.0)) AS BIGINT) AS max_price_bucket,
           max(CAST(power(CAST(l_quantity AS DOUBLE), 2.0) AS DOUBLE)) AS max_qty_sq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def scalar_math_funcs(spark, sf_dir):
    """round/abs/sqrt/floor/power — IEEE-exact operations only, so both
    engines agree bit-for-bit."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.round(F.sum(F.round(dec("l_extendedprice") * dec("l_discount"), 2)), 2)
        .cast("double")
        .alias("discount_total"),
        F.max(F.round(F.sqrt(F.col("l_quantity").cast("double")), 6)).alias("max_sqrt_qty"),
        F.min(F.abs(F.col("l_quantity").cast("double") - 25.0)).alias("min_abs_dev"),
        F.max(F.floor(F.col("l_extendedprice").cast("double") / 10000.0)).alias(
            "max_price_bucket"
        ),
        F.max(F.pow(F.col("l_quantity").cast("double"), 2.0).cast("double")).alias("max_qty_sq"),
    )


@query(
    "scalar_json_funcs",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           array_to_string(json_keys(props), ',') AS key_list
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1, 3
    """,
)
def scalar_json_funcs(spark, sf_dir):
    """get_json_object extraction + schema introspection of the open
    payload map (the reference's payload: Dict[str,Any] carried as a
    JSON string column, SURVEY.md §1.2)."""
    e = load_table(spark, "events", sf_dir).where(F.col("props").isNotNull())
    keys = F.map_keys(F.from_json("props", "map<string,string>"))
    return e.groupBy(
        (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"),
        F.array_join(F.sort_array(keys), ",").alias("key_list"),
    ).agg(F.count(F.lit(1)).alias("n")).select("k_mod", "n", "key_list")


@query(
    "scalar_array_funcs",
    sql="""
    SELECT n_tokens,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN has_data THEN 1 ELSE 0 END) AS BIGINT) AS n_with_data,
           min(n_distinct_tokens) AS min_distinct,
           max(n_distinct_tokens) AS max_distinct
    FROM (
      SELECT CAST(len(str_split(trim(text), ' ')) AS INT) AS n_tokens,
             list_contains(str_split(trim(text), ' '), 'data') AS has_data,
             CAST(len(list_distinct(str_split(trim(text), ' '))) AS INT) AS n_distinct_tokens
      FROM documents
    ) GROUP BY n_tokens
    """,
)
def scalar_array_funcs(spark, sf_dir):
    """split/size/array_contains/array_distinct — array family over the
    documents corpus (single-space tokenization to match the oracle's
    str_split exactly)."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim("text"), " ")
    derived = d.select(
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
    return derived.groupBy("n_tokens").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("has_data"), 1).otherwise(0)).alias("n_with_data"),
        F.min("n_distinct_tokens").alias("min_distinct"),
        F.max("n_distinct_tokens").alias("max_distinct"),
    )


@query(
    "scalar_conditional_funcs",
    sql=f"""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           count(*) AS n,
           {sql_dsum("o_totalprice")} AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def scalar_conditional_funcs(spark, sf_dir):
    """CASE/coalesce/nullif — the conditional family (the reference's
    coalesce-style fallbacks, SURVEY.md §2.7)."""
    o = load_table(spark, "orders", sf_dir)
    band = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(
        band.alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias("status_norm"),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
