"""Relational breadth queries over the TPC-H-ish star schema —
the warehouse read path the reference delegates to ClickHouse
(SURVEY.md §3.2) re-expressed as Spark SQL/DataFrame plans, plus the
join/set-op/grouping-set operator families a complete engine needs.

Determinism: every double aggregate goes through the decimal-exact
helpers (functions/core.py) and every LIMIT is fully ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import davg, dsum, sql_davg, sql_dsum
from ..sources.tables import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# TPC-H Q1 analogue: pricing summary — wide aggregate with derived
# expressions, partial-aggregatable, single shuffle on a tiny key space.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: multi-measure aggregate with "
    "derived expressions over lineitem",
    tags=("relational", "agg", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 analogue: shipping priority — 3-way join, aggregate, top-10.
# customer is broadcast; orders⋈lineitem shuffles on the order key.
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey, o.o_orderdate,
           {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    description="TPC-H Q3 shipping priority: 3-way join + agg + ordered top-10",
    tags=("relational", "join", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 analogue: 6-way snowflake join through region→nation with the
# customer/supplier same-nation condition.
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5 local supplier volume: 6-way snowflake join with "
    "same-nation equi-condition",
    tags=("relational", "join", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s),
              (F.col("s_suppkey") == F.col("l_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 analogue: conditional EXISTS semi-join.
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    description="TPC-H Q4: EXISTS correlated semi-join with extra predicate",
    tags=("relational", "semi-join", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Anti-join: customers with no orders.
# ---------------------------------------------------------------------------


@register(
    "anti_join_customers_no_urgent_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    description="left anti-join: customers with no urgent order",
    tags=("relational", "anti-join"),
)
def anti_join_customers_no_urgent_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Filter + projection pushdown scan (the operator every 100 TB query
# lives or dies by; .explain must show PushedFilters + pruned ReadSchema).
# ---------------------------------------------------------------------------


@register(
    "filter_pushdown_scan",
    """
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate < TIMESTAMP '2000-02-01'
      AND l_quantity > 45.0
    """,
    description="predicate+projection pushdown scan on lineitem",
    tags=("relational", "scan", "pushdown"),
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-02-01").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# ROLLUP grouping sets over a joined dimension.
# ---------------------------------------------------------------------------


@register(
    "rollup_nation_segment",
    f"""
    SELECT n.n_name, c.c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    description="ROLLUP grouping sets (nation, segment) with decimal-exact sums",
    tags=("relational", "rollup", "agg"),
)
def rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), "sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations: UNION ALL / INTERSECT / EXCEPT.
# ---------------------------------------------------------------------------


@register(
    "set_ops_purchasers_vs_errors",
    """
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-28'
    )
    """,
    description="EXCEPT set op: purchasers with no error event in the final "
    "three days",
    tags=("relational", "setop"),
)
def set_ops_purchasers_vs_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchasers = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    errorers = (
        e.where(
            (F.col("event_type") == "error")
            & (F.col("ts") >= F.lit("2024-01-28").cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )
    return purchasers.subtract(errorers)


@register(
    "union_intersect_users",
    """
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    description="INTERSECT set op: users who both signed up and purchased",
    tags=("relational", "setop"),
)
def union_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select("user_id").distinct()
    purchasers = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    return signups.intersect(purchasers)


# ---------------------------------------------------------------------------
# TPC-H Q6 analogue: the canonical pushdown-friendly filter + aggregate.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
    description="TPC-H Q6 forecast revenue: tight range predicates + "
    "single aggregate (pure scan+filter+partial-agg, zero joins)",
    tags=("relational", "agg", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 analogue: returned-items revenue per customer, top 20.
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    description="TPC-H Q10 returned items: 4-way join, per-customer "
    "revenue, ordered top-20",
    tags=("relational", "join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 analogue: promo revenue share (conditional aggregate ratio).
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue_share",
    f"""
    SELECT
      ({sql_dsum("CASE WHEN p.p_type = 'PROMO' "
                 "THEN l.l_extendedprice * (1.0 - l.l_discount) "
                 "ELSE 0.0 END")}
       / {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')})
        AS promo_share,
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
    description="TPC-H Q14 promo revenue share: broadcast part join + "
    "conditional-aggregate ratio",
    tags=("relational", "join", "agg", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    joined = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    return joined.agg(
        (dsum(promo) / dsum(revenue)).alias("promo_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 analogue: disjunctive multi-clause join predicate.
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    description="TPC-H Q19: OR-of-ANDs predicate across both join sides "
    "(exercises predicate normalization + join filtering)",
    tags=("relational", "join", "tpch"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return joined.where(clause).agg(
        dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 analogue: HAVING over a grouped subquery + join back.
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_orders",
    f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           big.total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 150.0
    ) big ON big.l_orderkey = o.o_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    description="TPC-H Q18 large-volume orders: HAVING on a grouped "
    "subquery joined back to orders, ordered top-20",
    tags=("relational", "having", "tpch"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 150.0)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Skew-mitigation correctness: salted join must equal the plain join.
# ---------------------------------------------------------------------------


@register(
    "salted_join_counts",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_events
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    description="salted shuffle join (deterministic salt from event_id, "
    "dimension exploded x8) — oracle is the *plain* join: salting must "
    "not change results, only key distribution (skew mitigation at scale)",
    tags=("relational", "join", "skew"),
)
def salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salts = 8
    e = _t(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % n_salts).cast("int")
    )
    c = _t(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = e.join(
        c,
        (F.col("user_id") == F.col("c_custkey"))
        & (e["salt"] == c["salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Deterministic sampling — hash-gated instead of RNG (reproducible
# across engines, runs, and partitionings; the right way to sample a
# 100 TB training corpus).
# ---------------------------------------------------------------------------


@register(
    "deterministic_sample",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <= '1f'
    """,
    description="deterministic ~12.5% sample via md5 gate on the key "
    "(reproducible everywhere, unlike RNG TABLESAMPLE)",
    tags=("relational", "sampling"),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    gate = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    return e.where(gate <= "1f").select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "stratified_sample_20_per_type",
    """
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)) ASC,
                                         event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 20
    """,
    description="stratified sample: exactly 20 rows per event type, "
    "selected by hash order (deterministic, unbiased within stratum)",
    tags=("relational", "sampling", "window-fn"),
)
def stratified_sample_20_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")).asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("event_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Correlated scalar-aggregate pattern: customers above their nation's
# average balance (join against a grouped subquery).
# ---------------------------------------------------------------------------


@register(
    "above_nation_avg_balance",
    f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.nation_avg
    FROM customer c
    JOIN (
      SELECT c_nationkey, {sql_davg('c_acctbal')} AS nation_avg
      FROM customer GROUP BY c_nationkey
    ) n ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.nation_avg
    """,
    description="join against grouped subquery: customers above their "
    "nation's average balance",
    tags=("relational", "join", "subquery"),
)
def above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(davg(F.col("c_acctbal"), "nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), on="c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal", "nation_avg")
    )
