"""Declared queries: scalar function families (string, date, math,
array, json, conditional) — SURVEY.md §2.7/§2.10.

Each family is exercised inside an aggregation so outputs stay small
and hash-stable while the scalar work runs over the full table. The
six families are union-tagged into two multi-family queries (three
branches each) with a normalized schema, so the whole scalar surface
sits inside the driver's correctness window:

- ``scalar_string_json_array``   — string / json / array families
- ``scalar_date_math_conditional`` — date / math / conditional families

Branch results are widened to (family, grp, n, v1..vN[, s1]) with
typed NULL padding; every value column keeps its exact per-family
expression so the oracle still checks each function's output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import dec, dsum, query, sql_dsum

_DNULL = "CAST(NULL AS DOUBLE)"


@query(
    "scalar_string_json_array",
    sql=f"""
    SELECT 'string' AS family, first_word AS grp, count(*) AS n,
           CAST(min(name_len) AS DOUBLE) AS v1,
           CAST(max(name_len) AS DOUBLE) AS v2,
           {_DNULL} AS v3,
           min(upper_brand) AS s1
    FROM (
      SELECT regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
             length(p_name) AS name_len,
             upper(p_brand) AS upper_brand
      FROM part
      WHERE substr(p_name, 1, 1) BETWEEN 'a' AND 'z'
    ) GROUP BY first_word
    UNION ALL
    SELECT 'json' AS family,
           concat_ws('|', CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS VARCHAR),
                     array_to_string(json_keys(props), ',')) AS grp,
           count(*) AS n, {_DNULL} AS v1, {_DNULL} AS v2, {_DNULL} AS v3,
           CAST(NULL AS VARCHAR) AS s1
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 2
    UNION ALL
    SELECT 'array' AS family, CAST(n_tokens AS VARCHAR) AS grp, count(*) AS n,
           CAST(sum(CASE WHEN has_data THEN 1 ELSE 0 END) AS DOUBLE) AS v1,
           CAST(min(n_distinct_tokens) AS DOUBLE) AS v2,
           CAST(max(n_distinct_tokens) AS DOUBLE) AS v3,
           CAST(NULL AS VARCHAR) AS s1
    FROM (
      SELECT CAST(len(str_split(trim(text), ' ')) AS INT) AS n_tokens,
             list_contains(str_split(trim(text), ' '), 'data') AS has_data,
             CAST(len(list_distinct(str_split(trim(text), ' '))) AS INT) AS n_distinct_tokens
      FROM documents
    ) GROUP BY n_tokens
    UNION ALL
    SELECT 'chunk' AS family, CAST(off // 100 AS VARCHAR) AS grp, count(*) AS n,
           CAST(min(length(chunk_text)) AS DOUBLE) AS v1,
           CAST(max(length(chunk_text)) AS DOUBLE) AS v2,
           CAST(sum(length(chunk_text)) AS DOUBLE) AS v3,
           min(chunk_text) AS s1
    FROM (
      SELECT off, substr(text, CAST(off AS INT) + 1, 120) AS chunk_text FROM (
        SELECT unnest(range(0, greatest(length(text) - 21, 0) + 1, 100)) AS off, text
        FROM documents
      )
    ) GROUP BY 2
    """,
)
def scalar_string_json_array(spark, sf_dir):
    """String family (upper/length/substr/regexp_extract — all
    codegen'd), JSON family (get_json_object extraction + schema
    introspection of the open payload map, the reference's
    payload: Dict[str,Any] carried as a JSON string column, SURVEY.md
    §1.2), array family (split/size/array_contains/array_distinct
    over the documents corpus; single-space tokenization matches the
    oracle's str_split exactly), and chunk family (the real
    ``operators.corpus.chunk_documents`` overlapping-window operator,
    per-chunk-index length/count/text aggregates — its offset
    stopping rule and substring windows value-verified in DuckDB)."""
    # -- string branch (part) --
    p = load_table(spark, "part", sf_dir)
    derived = p.where(F.substring("p_name", 1, 1).between("a", "z")).select(
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("upper_brand"),
    )
    string_b = derived.groupBy(F.col("first_word").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("name_len").cast("double").alias("v1"),
        F.max("name_len").cast("double").alias("v2"),
        F.min("upper_brand").alias("s1"),
    ).select(
        F.lit("string").alias("family"), "grp", "n", "v1", "v2",
        F.lit(None).cast("double").alias("v3"), "s1",
    )
    # -- json branch (events) --
    e = load_table(spark, "events", sf_dir).where(F.col("props").isNotNull())
    keys = F.map_keys(F.from_json("props", "map<string,string>"))
    json_b = e.groupBy(
        F.concat_ws(
            "|",
            (F.get_json_object("props", "$.k").cast("bigint") % 10).cast("string"),
            F.array_join(F.sort_array(keys), ","),
        ).alias("grp")
    ).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("json").alias("family"), "grp", "n",
        F.lit(None).cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
        F.lit(None).cast("string").alias("s1"),
    )
    # -- array branch (documents) --
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim("text"), " ")
    arr = d.select(
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
    array_b = arr.groupBy(F.col("n_tokens").cast("string").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("has_data"), 1).otherwise(0)).cast("double").alias("v1"),
        F.min("n_distinct_tokens").cast("double").alias("v2"),
        F.max("n_distinct_tokens").cast("double").alias("v3"),
    ).select(
        F.lit("array").alias("family"), "grp", "n", "v1", "v2", "v3",
        F.lit(None).cast("string").alias("s1"),
    )
    # -- chunk branch (documents through the REAL chunk_documents
    # operator: posexplode(sequence)+substring windows, max 120 chars
    # with 20 overlap -> offsets step 100, so chunk_idx == off // 100
    # in the oracle) --
    from hrtech_etl_spark.operators.corpus import chunk_documents

    chunks = chunk_documents(d, "text", "doc_id", max_chars=120, overlap=20)
    chunk_b = chunks.groupBy(
        F.col("chunk_idx").cast("string").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.length("chunk_text")).cast("double").alias("v1"),
        F.max(F.length("chunk_text")).cast("double").alias("v2"),
        F.sum(F.length("chunk_text")).cast("double").alias("v3"),
        F.min("chunk_text").alias("s1"),
    ).select(F.lit("chunk").alias("family"), "grp", "n", "v1", "v2", "v3", "s1")
    return string_b.unionByName(json_b).unionByName(array_b).unionByName(chunk_b)


@query(
    "scalar_date_math_conditional",
    sql=f"""
    SELECT 'date' AS family,
           concat_ws('|', CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR),
                     CAST(CAST(date_part('year', o_orderdate) AS INT) AS VARCHAR),
                     CAST(CAST(date_part('quarter', o_orderdate) AS INT) AS VARCHAR)) AS grp,
           count(*) AS n,
           {sql_dsum("o_totalprice")} AS v1,
           {_DNULL} AS v2, {_DNULL} AS v3, {_DNULL} AS v4, {_DNULL} AS v5
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 2
    UNION ALL
    SELECT 'math' AS family, l_returnflag AS grp, CAST(NULL AS BIGINT) AS n,
           CAST(round(sum(round(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)), 2)), 2) AS DOUBLE) AS v1,
           max(round(sqrt(CAST(l_quantity AS DOUBLE)), 6)) AS v2,
           min(abs(CAST(l_quantity AS DOUBLE) - 25.0)) AS v3,
           CAST(max(floor(CAST(l_extendedprice AS DOUBLE) / 10000.0)) AS DOUBLE) AS v4,
           max(CAST(power(CAST(l_quantity AS DOUBLE), 2.0) AS DOUBLE)) AS v5
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'cond' AS family,
           concat_ws('|',
             CASE WHEN o_totalprice > 300000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END,
             coalesce(nullif(o_orderstatus, 'P'), 'PENDING')) AS grp,
           count(*) AS n,
           {sql_dsum("o_totalprice")} AS v1,
           {_DNULL} AS v2, {_DNULL} AS v3, {_DNULL} AS v4, {_DNULL} AS v5
    FROM orders GROUP BY 2
    """,
)
def scalar_date_math_conditional(spark, sf_dir):
    """Date family (date_trunc/year/quarter — monthly revenue rollup,
    the canonical partition-pruned time-series scan), math family
    (round/abs/sqrt/floor/power — IEEE-exact operations only, so both
    engines agree bit-for-bit), and conditional family (CASE/coalesce/
    nullif — the reference's coalesce-style fallbacks, SURVEY.md §2.7).
    """
    _dnull = F.lit(None).cast("double")
    # -- date branch (orders) --
    o = load_table(spark, "orders", sf_dir)
    recent = o.where("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'")
    date_b = recent.groupBy(
        F.concat_ws(
            "|",
            F.date_trunc("month", "o_orderdate").cast("date").cast("string"),
            F.year("o_orderdate").cast("string"),
            F.quarter("o_orderdate").cast("string"),
        ).alias("grp")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("v1")).select(
        F.lit("date").alias("family"), "grp", "n", "v1",
        _dnull.alias("v2"), _dnull.alias("v3"), _dnull.alias("v4"), _dnull.alias("v5"),
    )
    # -- math branch (lineitem) --
    l = load_table(spark, "lineitem", sf_dir)
    math_b = l.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.round(F.sum(F.round(dec("l_extendedprice") * dec("l_discount"), 2)), 2)
        .cast("double")
        .alias("v1"),
        F.max(F.round(F.sqrt(F.col("l_quantity").cast("double")), 6)).alias("v2"),
        F.min(F.abs(F.col("l_quantity").cast("double") - 25.0)).alias("v3"),
        F.max(F.floor(F.col("l_extendedprice").cast("double") / 10000.0))
        .cast("double")
        .alias("v4"),
        F.max(F.pow(F.col("l_quantity").cast("double"), 2.0).cast("double")).alias("v5"),
    ).select(
        F.lit("math").alias("family"), "grp",
        F.lit(None).cast("long").alias("n"), "v1", "v2", "v3", "v4", "v5",
    )
    # -- conditional branch (orders) --
    band = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    cond_b = o.groupBy(
        F.concat_ws(
            "|",
            band,
            F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")),
        ).alias("grp")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("v1")).select(
        F.lit("cond").alias("family"), "grp", "n", "v1",
        _dnull.alias("v2"), _dnull.alias("v3"), _dnull.alias("v4"), _dnull.alias("v5"),
    )
    return date_b.unionByName(math_b).unionByName(cond_b)
