"""Declared queries: relational operator surface (SURVEY.md §2.10 —
joins, aggregations, windows, set ops, sorts/top-k).

Plan-hygiene notes per query live in docstrings; the global rules:
dimensions broadcast, facts shuffle at most once, every window has a
total order, every float aggregate is decimal-exact before rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from hrtech_etl_spark.operators.joins import asof_join, equi_join, range_join, theta_join
from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import davg, dec, dsum, query, sql_davg, sql_dsum


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "join_inner_revenue",
    sql=f"""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def join_inner_revenue(spark, sf_dir):
    """Fact-fact equi join; both sides shuffle on l_orderkey (co-located
    at scale by bucketing both tables on the order key)."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'"
    )
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - dec("l_discount"))
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


@query(
    "join_left_histogram",
    sql="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY n_orders
    """,
)
def join_left_histogram(spark, sf_dir):
    """Left join preserving zero-order customers, then a histogram —
    two aggregations, the second over already-tiny data."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "join_right_outer",
    sql="""
    SELECT coalesce(c.c_mktsegment, '<no customer>') AS segment,
           count(*) AS n_orders,
           count(c.c_custkey) AS n_with_customer
    FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer join: every order survives, customer side nullable
    (planner note: Catalyst flips build sides freely — right outer
    broadcasts the left/customer side)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    joined = c.join(o, c.c_custkey == o.o_custkey, "right")
    return joined.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("<no customer>")).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("c_custkey").alias("n_with_customer"),
    )


@query(
    "join_semi",
    sql="""
    SELECT c_mktsegment AS segment, count(*) AS n_active
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                    AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """left_semi = EXISTS: no payload columns from the right side move
    through the shuffle."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
    )
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    return active.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_active")
    )


@query(
    "join_anti",
    sql="""
    SELECT c_nationkey AS nationkey, count(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def join_anti(spark, sf_dir):
    """left_anti = NOT EXISTS — the reference's skipped_missing side
    (core/pipeline.py:151-159) as a first-class operator."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    inactive = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return inactive.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_inactive")
    )


@query(
    "join_full_outer",
    sql="""
    WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         ss AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cc.nk, ss.nk) AS nationkey,
           coalesce(cc.n_cust, 0) AS n_customers,
           coalesce(ss.n_supp, 0) AS n_suppliers
    FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join of two pre-aggregated sides (aggregate before
    joining — the join input is 25 rows, not 150k)."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    ss = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    joined = cc.alias("cc").join(ss.alias("ss"), F.col("cc.nk") == F.col("ss.nk"), "full_outer")
    return joined.select(
        F.coalesce(F.col("cc.nk"), F.col("ss.nk")).alias("nationkey"),
        F.coalesce(F.col("cc.n_cust"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("ss.n_supp"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_broadcast_dim",
    sql=f"""
    SELECT p.p_brand AS brand,
           count(*) AS n_items,
           {sql_dsum("l.l_extendedprice")} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """Fact ⋈ small dim with an explicit broadcast hint: zero shuffle
    of the fact table — THE canonical 100TB join shape."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    joined = equi_join(l, p, l.l_partkey == p.p_partkey, broadcast_right=True)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_extendedprice").alias("revenue")
    )


@query(
    "join_theta_pairs",
    sql="""
    SELECT a.p_size AS size, count(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
     AND a.p_retailprice > b.p_retailprice
    GROUP BY a.p_size
    """,
)
def join_theta_pairs(spark, sf_dir):
    """Theta join (equi prefix + two inequality conjuncts): Catalyst
    shuffles on the equi part and evaluates the rest post-probe; never
    a cartesian."""
    a = load_table(spark, "part", sf_dir).alias("a")
    b = load_table(spark, "part", sf_dir).alias("b")
    cond = (
        (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.col("a.p_retailprice") > F.col("b.p_retailprice"))
    )
    return theta_join(a, b, cond).groupBy(F.col("a.p_size").alias("size")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@query(
    "join_range_interval",
    sql=f"""
    SELECT l.l_linestatus AS linestatus,
           count(*) AS n,
           {sql_dsum("l.l_extendedprice")} AS revenue
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
)
def join_range_interval(spark, sf_dir):
    """Range/interval join anchored on an equi key: the range conjunct
    rides the equi shuffle as a cheap post-filter."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    joined = range_join(
        l,
        o,
        on=l.l_orderkey == o.o_orderkey,
        range_condition=(l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
    )
    return joined.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue")
    )


@query(
    "join_range_bucketed",
    sql="""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_pairs,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_price
    FROM (SELECT * FROM lineitem
          WHERE l_shipdate >= DATE '1995-03-01'
            AND l_shipdate < DATE '1995-04-01') l
    JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON CAST(l.l_shipdate AS TIMESTAMP) >= CAST(o.o_orderdate AS TIMESTAMP)
     AND CAST(l.l_shipdate AS TIMESTAMP)
         <= CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL 36 HOUR
    GROUP BY o.o_orderpriority
    """,
)
def join_range_bucketed(spark, sf_dir):
    """PURE range join (no equi key): March-1995 shipments falling
    inside any urgent order's 36-hour window. Naively this is a
    BroadcastNestedLoopJoin (O(|L|*|R|)); the bucketed rewrite
    quantizes time, explodes each interval over its ~2 day-buckets,
    and equi-joins on the bucket — one shuffle, per-bucket products
    (operators/joins.py::bucketed_range_join). The oracle states the
    plain theta join."""
    from hrtech_etl_spark.operators.joins import bucketed_range_join

    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= "1995-03-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    start = F.col("o_orderdate").cast("timestamp")
    joined = bucketed_range_join(
        li,
        o,
        left_point=F.col("l_shipdate").cast("timestamp"),
        right_start=start,
        right_end=start + F.expr("INTERVAL 36 HOURS"),
        bucket_seconds=86400,
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_price"),
    )


@query(
    "join_asof",
    sql="""
    WITH o1 AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
             max_by(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id AS event_id,
           e.user_id AS user_id,
           o.o_orderkey AS matched_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS order_price
    FROM events e ASOF JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each event gets the user's most recent order at or
    before the event time. Right side deduped to one row per
    (custkey, date) so the as-of pick is unambiguous; implementation is
    union+window (one shuffle, no row explosion — operators/joins.py)."""
    events = load_table(spark, "events", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    o1 = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        o1,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
    )
    return joined.where(F.col("o_orderkey").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("matched_orderkey"),
        F.col("o_totalprice").cast("double").alias("order_price"),
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       {sql_dsum("l_quantity")} AS sum_qty,
       {sql_dsum("l_extendedprice")} AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
       {sql_davg("l_quantity")} AS avg_qty,
       {sql_davg("l_extendedprice")} AS avg_price,
       {sql_davg("l_discount")} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

@query("agg_pricing_summary", sql=_Q1_SQL)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary: partial (map-side) aggregation
    collapses 6M rows/SF to 4 groups before the shuffle; decimal sums
    keep the hash engine-exact."""
    l = load_table(spark, "lineitem", sf_dir).where(
        "l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
    )
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    d = F.col("l_discount").cast("decimal(6,4)")
    t = F.col("l_tax").cast("decimal(6,4)")
    one = F.lit(1).cast("decimal(2,0)")
    return l.groupBy(
        F.col("l_returnflag").alias("returnflag"), F.col("l_linestatus").alias("linestatus")
    ).agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(p * (one - d)), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(p * (one - d) * (one + t)), 2).cast("double").alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_count_distinct",
    sql="""
    SELECT l_returnflag AS returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Multi-column distinct aggregation (expands to per-distinct
    shuffles; AQE coalesces the small side)."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    sql=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, {sql_dsum("o_totalprice")} AS revenue
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "revenue",
        )
    )


@query(
    "agg_cube",
    sql=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n, {sql_dsum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "agg_grouping_sets",
    sql=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, {sql_dsum("o_totalprice")} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Custom grouping sets via the SQL surface (same Catalyst Expand
    operator as rollup/cube)."""
    o = load_table(spark, "orders", sf_dir)
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        f"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_moments_stddev",
    sql="""
    SELECT o_orderstatus AS status,
           n,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 4) AS stddev_price
    FROM (
      SELECT o_orderstatus,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s1,
             sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS s2
      FROM orders GROUP BY o_orderstatus
    )
    """,
)
def agg_moments_stddev(spark, sf_dir):
    """Sample stddev from exact decimal moments (sum, sum-of-squares):
    order-independent across engines, unlike streaming variance."""
    o = load_table(spark, "orders", sf_dir)
    x = dec("o_totalprice")
    base = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
    )
    return base.select(
        F.col("o_orderstatus").alias("status"),
        "n",
        F.round(
            F.sqrt(
                (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n"))
                / (F.col("n") - 1)
            ),
            4,
        ).alias("stddev_price"),
    )


@query(
    "agg_pivot",
    sql=f"""
    SELECT l_returnflag AS returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot = groupBy().pivot() — compiles to the same conditional
    aggregation the SQL spells out."""
    l = load_table(spark, "lineitem", sf_dir)
    pivoted = (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec("l_quantity")), 2).cast("double"))
    )
    return pivoted.select("returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F"))


@query(
    "agg_unpivot",
    sql="""
    SELECT c_custkey AS custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def agg_unpivot(spark, sf_dir):
    """Unpivot/melt (wide → long): DataFrame `unpivot` compiles to the
    same Expand the UNION ALL oracle spells out — one scan, no self-
    union."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumnRenamed("c_custkey", "custkey")


@query("agg_approx_distinct", sql=None)  # approximate: rows-only check
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct estimate — the scale path when exact
    distinct's shuffle is the bottleneck. No SQL oracle (estimator is
    engine-specific); sanity bounds are unit-tested instead."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

@query(
    "window_topk_per_group",
    sql="""
    SELECT segment, o_orderkey AS orderkey, CAST(o_totalprice AS DOUBLE) AS price, CAST(rn AS INT) AS rn FROM (
      SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Per-group top-k: row_number + filter. At scale, pre-aggregate or
    use a partial top-k per partition before the window shuffle."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("segment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "segment",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("price"),
            "rn",
        )
    )


@query(
    "window_rank_dense",
    sql="""
    SELECT p_brand AS brand, p_partkey AS partkey,
           CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_dense_rank
    FROM part
    """,
)
def window_rank_dense(spark, sf_dir):
    """rank/dense_rank with ties (identical prices rank equally —
    deterministic output values even without a total order)."""
    p = load_table(spark, "part", sf_dir)
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey"),
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "window_lag_lead",
    sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_running_sum",
    sql="""
    SELECT event_id,
           user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    """Running sum with an explicit ROWS frame; decimal accumulation →
    engine-exact prefix sums."""
    e = load_table(spark, "events", sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


@query(
    "agg_percentiles",
    sql="""
    SELECT o_orderpriority AS priority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    SQL quantile_cont semantics: linear interpolation between order
    statistics). At corpus scale swap for percentile_approx — declared
    exact here so the oracle checks values."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", 0.99), 2).alias("p99"),
    )


@query(
    "window_range_frame",
    sql="""
    SELECT o_orderkey AS orderkey,
           CAST(count(*) OVER w AS BIGINT) AS n_last_30d,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
             AS sum_last_30d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a value axis (trailing 30-day per-customer
    order count/revenue): unlike ROWS frames, peers are defined by the
    ordering VALUE, so results are independent of tie order —
    the frame spec a time-decayed feature pipeline uses. Decimal
    accumulation keeps the windowed sums engine-exact."""
    o = load_table(spark, "orders", sf_dir)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, W.currentRow)
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.count(F.lit(1)).over(w).alias("n_last_30d"),
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("sum_last_30d"),
    )


@query(
    "window_ntile_percentile",
    sql="""
    SELECT c_custkey AS custkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percentile(spark, sf_dir):
    """Distribution functions over a total order. Single unpartitioned
    window — at scale replace with approx percentiles or range
    partitioning; declared here for parity."""
    c = load_table(spark, "customer", sf_dir)
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------

@query(
    "sort_topk_global",
    sql="""
    SELECT o_orderkey AS orderkey, CAST(o_totalprice AS DOUBLE) AS price, o_orderdate AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk_global(spark, sf_dir):
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full sort."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderdate").alias("order_date"),
        )
    )


@query(
    "setop_union_counts",
    sql="""
    SELECT nk AS nationkey, count(*) AS n_parties FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
)
def setop_union_counts(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy(F.col("nk").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_parties")
    )


@query(
    "setop_intersect",
    sql="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def setop_intersect(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    y94 = o.where(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("custkey"))
    y95 = o.where(
        "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("custkey"))
    return y94.intersect(y95)


@query(
    "setop_except",
    sql="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def setop_except(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    y94 = o.where(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("custkey"))
    y95 = o.where(
        "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("custkey"))
    return y94.subtract(y95)  # EXCEPT DISTINCT semantics
