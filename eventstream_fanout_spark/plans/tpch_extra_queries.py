"""TPC-H remainder (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20/Q21/Q22),
adapted to the testdata schema — there is no ``partsupp`` table and
several TPC-H columns (l_commitdate/l_receiptdate, o_comment, c_phone,
p_container, p_mfgr) don't exist, so each query keeps the ORIGINAL
OPERATOR SHAPE (correlated min subquery, EXISTS/NOT EXISTS pair,
HAVING against a scalar subquery, count-distinct histogram, view
reuse, nested IN) on the columns that do.  The part↔supplier link is
derived from lineitem (``SELECT DISTINCT l_partkey, l_suppkey``) where
partsupp would be used.

Determinism: double aggregates via dsum/davg (functions/core.py);
double equality comparisons only between identically-computed values;
every LIMIT fully ordered with unique tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import davg, dsum, sql_davg, sql_dsum
from ..sources.tables import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_SUPPLIED = """
  supplied AS (
    SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
    FROM lineitem
  )
"""


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated MIN subquery over the derived
# part↔supplier link (partsupp analogue), decorrelated in Spark as a
# groupBy-min + equality join (what Catalyst rewrites the subquery to).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_SUPPLIED}
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, s.s_acctbal
    FROM part p
    JOIN supplied ps ON ps.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'LARGE'
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplied ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
        WHERE ps2.partkey = p.p_partkey
      )
    ORDER BY s.s_acctbal ASC, n.n_name ASC, s.s_name ASC, p.p_partkey ASC
    LIMIT 20
    """,
    description="TPC-H Q2 shape: per-part minimum over the derived "
    "part-supplier link via correlated MIN subquery (Spark: groupBy-min "
    "+ equality join — the decorrelated plan); double equality is safe "
    "because MIN does no arithmetic",
    tags=("relational", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    supplied = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    linked = supplied.join(
        F.broadcast(s), F.col("suppkey") == F.col("s_suppkey")
    )
    min_bal = linked.groupBy("partkey").agg(
        F.min("s_acctbal").alias("min_acctbal")
    )
    return (
        linked.join(F.broadcast(min_bal), "partkey")
        .where(F.col("s_acctbal") == F.col("min_acctbal"))
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal")
        .orderBy(
            F.asc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations, both directions.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1.0 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: nation-pair shipping volume by year, both "
    "directions via disjunctive nation predicate",
    tags=("relational", "join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    volume = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("nk2") == F.col("c_nationkey"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8: market share of one supplier nation within a region's imports.
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ({sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
            / {sql_dsum('volume')}) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1.0 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    """,
    description="TPC-H Q8: market-share ratio of conditional volume over "
    "total volume per year (8-way snowflake join, dsum/dsum ratio)",
    tags=("relational", "join", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    base = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("rk1"))
        .join(F.broadcast(n2), F.col("nk2") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    national = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return base.groupBy("o_year").agg(
        (dsum(national) / dsum(F.col("volume"))).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and year (partsupp cost
# replaced by a retail-price-based cost, same join/agg shape).
# ---------------------------------------------------------------------------


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1.0 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'ECONOMY'
    ) profit
    GROUP BY nation, o_year
    """,
    description="TPC-H Q9 shape: profit = revenue minus derived cost, "
    "grouped by supplier nation and order year",
    tags=("relational", "join", "tpch"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (
        F.lit(1.0) - F.col("l_discount")
    ) - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11: groups whose aggregate exceeds a fraction of the global total —
# HAVING against a scalar subquery (Spark: agg + broadcast cross join).
# ---------------------------------------------------------------------------


@register(
    "q11_important_balance",
    f"""
    SELECT n.n_name, {sql_dsum('s.s_acctbal')} AS total_bal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    HAVING {sql_dsum('s.s_acctbal')} > (
      SELECT 0.05 * {sql_dsum('s2.s_acctbal')} FROM supplier s2
    )
    """,
    description="TPC-H Q11 shape: per-group total filtered against a "
    "fraction of the global scalar (HAVING + scalar subquery; Spark "
    "decorrelates via broadcast cross join of the 1-row global agg)",
    tags=("relational", "subquery", "tpch"),
)
def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("s_acctbal"), "total_bal"))
    )
    global_total = s.agg(
        (F.lit(0.05) * dsum(F.col("s_acctbal"))).alias("threshold")
    )
    return (
        per_nation.crossJoin(F.broadcast(global_total))
        .where(F.col("total_bal") > F.col("threshold"))
        .select("n_name", "total_bal")
    )


# ---------------------------------------------------------------------------
# Q12: priority-class CASE-sums by shipping-delay class (no l_shipmode /
# l_commitdate in the testdata; delay buckets keep the shape).
# ---------------------------------------------------------------------------


@register(
    "q12_shipping_delay_priority",
    """
    SELECT delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o.o_orderpriority,
             CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) > 90
                  THEN 'late' ELSE 'ontime' END AS delay_class
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ) classed
    GROUP BY delay_class
    """,
    description="TPC-H Q12 shape: conditional CASE-sum counts of order "
    "priorities per shipping-delay class",
    tags=("relational", "agg", "tpch"),
)
def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.when(delay > 90, "late").otherwise("ontime").alias("delay_class"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(high.cast("int")).cast("bigint").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (left join keeps 0-order
# customers; o_comment filter replaced by a priority filter).
# ---------------------------------------------------------------------------


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    description="TPC-H Q13: two-level aggregation — orders per customer "
    "(left join preserving zero-order customers, join-condition filter) "
    "then histogram of those counts",
    tags=("relational", "agg", "outer-join", "tpch"),
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier by revenue — reused revenue view + max-equality.
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey ASC
    """,
    description="TPC-H Q15: revenue view reused for both ranking and the "
    "max scalar subquery; double equality safe (identical dsum on both "
    "occurrences)",
    tags=("relational", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.asc("s_suppkey"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per part attribute — count-distinct over the
# derived link, NOT IN exclusion subquery.
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_counts",
    f"""
    WITH {_SUPPLIED}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM supplied ps JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND ps.suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    description="TPC-H Q16 shape: distinct supplier counts per part "
    "attribute over the derived link, with a NOT IN exclusion subquery "
    "(Spark: left-anti join)",
    tags=("relational", "subquery", "anti-join", "tpch"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    supplied = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    return (
        supplied.join(
            F.broadcast(bad_supp),
            F.col("suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity revenue — correlated average subquery per part.
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT ({sql_dsum('l.l_extendedprice')} / 7.0) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.2 * {sql_davg('l2.l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    description="TPC-H Q17: rows below 20% of their part's average "
    "quantity (correlated AVG subquery; Spark: per-part davg joined "
    "back — the decorrelated aggregate plan)",
    tags=("relational", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * davg(F.col("l_quantity"))).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(per_part), F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q20: nested-IN supplier promotion — suppliers who moved significant
# volume of a part type in a window.
# ---------------------------------------------------------------------------


@register(
    "q20_promotion_suppliers",
    f"""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO'
      )
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING {sql_dsum('l.l_quantity')} > 400.0
    )
    ORDER BY s.s_name ASC
    """,
    description="TPC-H Q20 shape: nested IN subqueries — suppliers whose "
    "shipped PROMO-part quantity in the window exceeds a threshold "
    "(Spark: semi-joins over the filtered aggregate)",
    tags=("relational", "subquery", "semi-join", "tpch"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    promo_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    movers = (
        l.join(
            F.broadcast(promo_parts),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 400.0)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(movers),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy(F.asc("s_name"))
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who alone shipped late on multi-supplier orders —
# EXISTS + NOT EXISTS pair (no l_receiptdate; lateness = shipdate more
# than 60 days after the order date).
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
    description="TPC-H Q21: EXISTS/NOT EXISTS pair — late lines on "
    "finished multi-supplier orders where no OTHER supplier was late "
    "(Spark: per-order supplier/late-supplier distinct counts, filter "
    "n_supp > 1 AND n_late_supp == 1 — the decorrelated equivalent)",
    tags=("relational", "subquery", "exists", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    lines = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        lines.where(F.col("is_late"))
        .join(per_order.withColumnRenamed("l_orderkey", "ok"),
              F.col("ok") == F.col("l_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22: above-average-balance customers with no urgent orders, grouped
# by a derived country code (no c_phone; nationkey-derived code).
# ---------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    f"""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_nationkey % 5 IN (0, 1, 2)
        AND c.c_acctbal > (
          SELECT {sql_davg('c2.c_acctbal')} FROM customer c2
          WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
        )
    ) eligible
    GROUP BY cntrycode
    """,
    description="TPC-H Q22 shape: above-global-average balances with a "
    "NOT EXISTS order filter, grouped by derived country code (Spark: "
    "broadcast scalar + left-anti join)",
    tags=("relational", "subquery", "anti-join", "tpch"),
)
def q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(
        (F.col("c_nationkey") % 5).isin(0, 1, 2)
    )
    avg_bal = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
        )
        .select(
            (F.col("c_nationkey") % 5).cast("int").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )
