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
from hrtech_etl_spark.operators.ranking import with_global_ranks
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
    """Outer join preserving zero-order customers, then a histogram —
    two aggregations, the second over already-tiny data. Written as
    ``orders RIGHT JOIN customer`` (≡ customer LEFT JOIN orders) so the
    right-outer join type is exercised too; the oracle states the LEFT
    form."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


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
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def join_anti(spark, sf_dir):
    """left_anti = NOT EXISTS — the reference's skipped_missing side
    (core/pipeline.py:151-159) as a first-class operator.

    The right side is restricted to '1-URGENT' orders: every fixture
    customer has >=1 order overall, so the unrestricted anti set is
    empty at every SF and its gate would only pin empty==empty (round
    10 verdict). Against the urgent subset the result is non-empty and
    discriminative at all gate SFs (sf0.001: 18 customers / 13
    nations; sf0.01: 203 / 25). The filter lands UNDER the anti join
    (pushed into the orders scan), so the operator under test — the
    shuffled left_anti itself — is unchanged."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
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
    "join_nonequi_suite",
    sql=f"""
    SELECT 'theta' AS kind, CAST(a.p_size AS VARCHAR) AS grp,
           count(*) AS n, CAST(NULL AS DOUBLE) AS revenue
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
     AND a.p_retailprice > b.p_retailprice
    GROUP BY a.p_size
    UNION ALL
    SELECT 'range_equi' AS kind, l.l_linestatus AS grp,
           count(*) AS n, {sql_dsum("l.l_extendedprice")} AS revenue
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
)
def join_nonequi_suite(spark, sf_dir):
    """Non-equi join family, union-tagged into one result:

    - ``theta``: equi prefix + two inequality conjuncts — Catalyst
      shuffles on the equi part and evaluates the rest post-probe;
      never a cartesian.
    - ``range_equi``: interval predicate anchored on an equi key — the
      range conjunct rides the equi shuffle as a cheap post-filter.

    (The pure range join with NO equi anchor is `join_range_bucketed`.)
    """
    a = load_table(spark, "part", sf_dir).alias("a")
    b = load_table(spark, "part", sf_dir).alias("b")
    cond = (
        (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.col("a.p_retailprice") > F.col("b.p_retailprice"))
    )
    theta = (
        theta_join(a, b, cond)
        .groupBy(F.col("a.p_size").alias("size"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("theta").alias("kind"),
            F.col("size").cast("string").alias("grp"),
            "n",
            F.lit(None).cast("double").alias("revenue"),
        )
    )
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    joined = range_join(
        l,
        o,
        on=l.l_orderkey == o.o_orderkey,
        range_condition=(l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
    )
    ranged = joined.groupBy(F.col("l_linestatus").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue")
    ).select(F.lit("range_equi").alias("kind"), "grp", "n", "revenue")
    return theta.unionByName(ranged)


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
    "agg_multidim_grouping",
    sql=f"""
    SELECT 'rollup' AS mode,
           coalesce(o_orderstatus, 'ALL') AS k1,
           coalesce(o_orderpriority, 'ALL') AS k2,
           count(*) AS n, {sql_dsum("o_totalprice")} AS meas
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'cube' AS mode,
           coalesce(l_returnflag, 'ALL') AS k1,
           coalesce(l_linestatus, 'ALL') AS k2,
           count(*) AS n, {sql_dsum("l_quantity")} AS meas
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'gsets' AS mode,
           coalesce(o_orderstatus, 'ALL') AS k1,
           coalesce(o_orderpriority, 'ALL') AS k2,
           count(*) AS n, {sql_dsum("o_totalprice")} AS meas
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_multidim_grouping(spark, sf_dir):
    """Multi-dimensional grouping family — ROLLUP, CUBE and custom
    GROUPING SETS (all the same Catalyst Expand operator under the
    hood), union-tagged by `mode` into one hash-checked result. Expand
    multiplies rows BEFORE the shuffle (one row per grouping set), so
    partial aggregation still collapses each set map-side."""
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    rollup = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("meas"))
        .select(
            F.lit("rollup").alias("mode"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "n",
            "meas",
        )
    )
    cube = (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("meas"))
        .select(
            F.lit("cube").alias("mode"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("k1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("k2"),
            "n",
            "meas",
        )
    )
    o.createOrReplaceTempView("__orders_gs")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS mode,
               coalesce(o_orderstatus, 'ALL') AS k1,
               coalesce(o_orderpriority, 'ALL') AS k2,
               count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS meas
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


@query(
    "agg_stats_profile",
    sql="""
    SELECT status, n, stddev_price, p50, p90, p99
    FROM (
      SELECT o_orderstatus AS status,
             count(*) AS n,
             round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                        - CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                          * CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*))
                        / (count(*) - 1)), 4) AS stddev_price,
             round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
             round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
             round(quantile_cont(o_totalprice, 0.99), 2) AS p99
      FROM orders GROUP BY o_orderstatus
    )
    """,
)
def agg_stats_profile(spark, sf_dir):
    """Distribution profile per group, two statistical families in one
    aggregation pass:

    - sample stddev from exact decimal moments (sum, sum-of-squares) —
      order-independent across engines, unlike streaming variance;
    - exact interpolated percentiles (Spark `percentile` == SQL
      quantile_cont: linear interpolation between order statistics).
      At corpus scale swap for percentile_approx — declared exact here
      so the oracle checks values."""
    o = load_table(spark, "orders", sf_dir)
    x = dec("o_totalprice")
    base = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", 0.99), 2).alias("p99"),
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
        "p50",
        "p90",
        "p99",
    )


@query(
    "agg_pivot_unpivot",
    sql=f"""
    WITH piv AS (
      SELECT l_returnflag AS returnflag,
             {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
             {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT returnflag, 'qty_O' AS linestatus, qty_O AS qty FROM piv
    UNION ALL
    SELECT returnflag, 'qty_F' AS linestatus, qty_F AS qty FROM piv
    """,
)
def agg_pivot_unpivot(spark, sf_dir):
    """Pivot→unpivot round trip: `groupBy().pivot()` (compiles to the
    conditional aggregation the oracle spells out) immediately melted
    back to long form by DataFrame `unpivot` (Catalyst Expand — one
    pass over the pivoted rows, no self-union)."""
    l = load_table(spark, "lineitem", sf_dir)
    pivoted = (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec("l_quantity")), 2).cast("double"))
        .select("returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F"))
    )
    return pivoted.unpivot(
        ids=["returnflag"],
        values=["qty_O", "qty_F"],
        variableColumnName="linestatus",
        valueColumnName="qty",
    )


@query(
    "agg_approx_distinct",
    # SHAPE-matched oracle: exact COUNT(DISTINCT) with identical column
    # names/groups, so the gate verifies row count + schema.  The VALUE
    # is intentionally different (HLL++ estimate vs exact count) —
    # hash_exempt marks the value hash as not comparable by design; the
    # estimate itself is value-gated by the `sketch_hll_accuracy`
    # canary (fails past 10% drift) and the rsd bound unit test.
    sql="""
    SELECT l_returnflag AS returnflag,
           COUNT(DISTINCT l_partkey) AS approx_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    hash_exempt=True,
)
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct estimate — the scale path when exact
    distinct's shuffle is the bottleneck. Oracle is the exact
    COUNT(DISTINCT) with matching shape (rows+schema gate); the
    estimate's accuracy is separately value-gated by the
    `sketch_hll_accuracy` canary and unit-tested rsd bounds."""
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
    use a partial top-k per partition before the window shuffle.

    No forced broadcast hint on customer: the table is sf-proportional
    (TPC-H 150k rows x sf), so a hard hint would override Spark's size
    threshold and OOM at cluster scale instead of degrading to a shuffle
    join. AQE picks broadcast whenever the dim actually fits."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
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
    "window_rank_suite",
    sql="""
    SELECT c_custkey AS custkey,
           CAST(rank() OVER wt AS INT) AS bal_rank,
           CAST(dense_rank() OVER wt AS INT) AS bal_dense_rank,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM customer
    WINDOW wt AS (ORDER BY c_acctbal),
           w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_suite(spark, sf_dir):
    """Ranking + distribution window family: rank/dense_rank over a
    ties-allowed ordering (identical balances rank equally),
    ntile/percent_rank/cume_dist over the total order — all computed by
    the DISTRIBUTED exact-rank plan (operators/ranking.py): range-bucket
    on the order value via a broadcast percentile_approx boundary array,
    bucket-local windows (every WindowExec partitioned), two-phase
    prefix-sum offsets over the ≤n_buckets totals frame broadcast back.
    Values are bit-identical to the global-window form (the round-12
    oracle hash is unchanged) but no stage ever moves the whole table
    to one partition — the plan that survives 100×."""
    c = load_table(spark, "customer", sf_dir)
    ranked = with_global_ranks(
        c,
        "c_acctbal",
        ("c_custkey",),
        rank="__rk",
        dense_rank="__dr",
        percent_rank="__pr",
        cume_dist="__cd",
        ntile={"quartile": 4},
    )
    return ranked.select(
        F.col("c_custkey").alias("custkey"),
        F.col("__rk").cast("int").alias("bal_rank"),
        F.col("__dr").cast("int").alias("bal_dense_rank"),
        "quartile",
        F.round(F.col("__pr"), 6).alias("pct_rank"),
        F.round(F.col("__cd"), 6).alias("cum_dist"),
    )


@query(
    "window_frame_suite",
    sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev,
           lead(o_orderkey) OVER w AS next_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(count(*) OVER wr AS BIGINT) AS n_last_30d,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER wr, 2) AS DOUBLE)
             AS sum_last_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wr AS (PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def window_frame_suite(spark, sf_dir):
    """Window frame family in one pass over one partitioning: lag/lead
    (physical offsets), a ROWS-frame running sum (decimal accumulation
    → engine-exact prefix sums), and a RANGE frame over a value axis
    (trailing 30-day per-customer count/revenue — peers defined by the
    ordering VALUE, so results are independent of tie order). All specs
    share PARTITION BY o_custkey: one exchange, sorts reused."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    wr = W.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, W.currentRow)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.sum(dec("o_totalprice")).over(wrun).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(wr).alias("n_last_30d"),
        F.round(F.sum(dec("o_totalprice")).over(wr), 2).cast("double").alias("sum_last_30d"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------

@query(
    "sort_topk_global",
    sql="""
    SELECT 'topk' AS family, o_orderkey AS orderkey,
           CAST(o_totalprice AS DOUBLE) AS price, o_orderdate AS order_date
    FROM (
      SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    )
    UNION ALL
    SELECT 'sample' AS family, o_orderkey AS orderkey,
           CAST(o_totalprice AS DOUBLE) AS price, o_orderdate AS order_date
    FROM (
      SELECT o_orderkey, o_totalprice, o_orderdate,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY (('0x' || substr(md5('0:' || ('42:' || CAST(o_orderkey AS VARCHAR))), 1, 8))::BIGINT),
                        o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 20
    """,
)
def sort_topk_global(spark, sf_dir):
    """Global top-k (orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full sort) UNION a
    deterministic exact stratified sample through the REAL
    ``operators.corpus.stratified_sample_exact`` (portable seeded-hash
    ranking, 20 rows per order status) — the sampler's ranking and
    exactness are value-verified against the identical md5 ranking in
    DuckDB."""
    from hrtech_etl_spark.operators.corpus import stratified_sample_exact

    o = load_table(spark, "orders", sf_dir)
    cols = [
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderdate").alias("order_date"),
    ]
    topk = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(F.lit("topk").alias("family"), *cols)
    )
    sample = stratified_sample_exact(
        o, ["o_orderstatus"], 20, id_col="o_orderkey", seed=42
    ).select(F.lit("sample").alias("family"), *cols)
    return topk.unionByName(sample)


@query(
    "setop_suite",
    sql="""
    SELECT 'union' AS op, CAST(nk AS VARCHAR) AS key, count(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    UNION ALL
    SELECT 'intersect' AS op, CAST(k AS VARCHAR) AS key, CAST(NULL AS BIGINT) AS n FROM (
      SELECT o_custkey AS k FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    UNION ALL
    SELECT 'except' AS op, CAST(k AS VARCHAR) AS key, CAST(NULL AS BIGINT) AS n FROM (
      SELECT o_custkey AS k FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    """,
)
def setop_suite(spark, sf_dir):
    """Set-operator family union-tagged into one result: UNION ALL (+
    count per key), INTERSECT and EXCEPT (both DISTINCT semantics —
    hash-aggregate + co-partitioned existence join under the hood;
    same single shuffle shape the standalone operators had)."""
    c = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    union = (
        c.unionByName(s)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union").alias("op"), F.col("nk").cast("string").alias("key"), "n")
    )
    o = load_table(spark, "orders", sf_dir)
    y96 = o.where(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("k"))
    y97 = o.where(
        "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    ).select(F.col("o_custkey").alias("k"))
    both = y96.intersect(y97).select(
        F.lit("intersect").alias("op"),
        F.col("k").cast("string").alias("key"),
        F.lit(None).cast("long").alias("n"),
    )
    only96 = y96.subtract(y97).select(  # EXCEPT DISTINCT semantics
        F.lit("except").alias("op"),
        F.col("k").cast("string").alias("key"),
        F.lit(None).cast("long").alias("n"),
    )
    return union.unionByName(both).unionByName(only96)
