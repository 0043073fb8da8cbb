"""Data-quality expectation checks — the dbt-test / Great-Expectations
operator family: declarative rules (not-null, unique, accepted range,
accepted values, referential integrity) evaluated as ONE aggregation
pass per table plus one anti-join per foreign key, emitting a uniform
per-rule violations report.

Scale shape: N column rules over a table cost one scan with N
conditional partial aggregates (never N scans); the referential rule
is a broadcast/shuffle anti-join keyed on the FK.  The report itself
is k rules x 1 row — driver-safe at any corpus size.  The reference
has no analogue (its only validation is the webhook receiver's id set,
external-api/app.py:4-11); a warehouse ingesting 100 TB/day runs
exactly this after every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _rule_rows(agg_df: DataFrame, rules: list[tuple[str, str, str]]) -> DataFrame:
    """Explode a 1-row multi-counter aggregate into per-rule rows.

    ``rules`` = (rule_name, table, violation_counter_col); the source
    aggregate must also carry ``n_checked``.
    """
    out = None
    for rule, table, col in rules:
        row = agg_df.select(
            F.lit(rule).alias("rule"),
            F.lit(table).alias("table_name"),
            F.col("n_checked"),
            F.col(col).alias("n_violations"),
            (F.col(col) == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "dq_expectations_report",
    """
    WITH li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_nn,
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
      FROM lineitem
    ),
    ord AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_status
      FROM orders
    ),
    ev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_nn,
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS v_uniq
      FROM events
    ),
    fk AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_checked,
             CAST(COUNT(*) AS BIGINT) AS v_orphan
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'not_null:l_orderkey' AS rule, 'lineitem' AS table_name,
           n_checked, v_nn AS n_violations, v_nn = 0 AS passed FROM li
    UNION ALL
    SELECT 'range:l_quantity:1-50', 'lineitem',
           n_checked, v_qty, v_qty = 0 FROM li
    UNION ALL
    SELECT 'range:l_discount:0-0.1', 'lineitem',
           n_checked, v_disc, v_disc = 0 FROM li
    UNION ALL
    SELECT 'accepted_values:o_orderstatus', 'orders',
           n_checked, v_status, v_status = 0 FROM ord
    UNION ALL
    SELECT 'not_null:event_id', 'events',
           n_checked, v_nn, v_nn = 0 FROM ev
    UNION ALL
    SELECT 'unique:event_id', 'events',
           n_checked, v_uniq, v_uniq = 0 FROM ev
    UNION ALL
    SELECT 'referential:lineitem.l_orderkey->orders', 'lineitem',
           n_checked, v_orphan, v_orphan = 0 FROM fk
    """,
    description="declarative data-quality expectations (the dbt-test / "
    "Great-Expectations family): not-null, accepted range, accepted "
    "values, uniqueness, and FK referential integrity over "
    "lineitem/orders/events, emitted as a uniform per-rule violations "
    "report.  All column rules for a table fold into ONE scan with "
    "conditional partial aggregates; the FK rule is one anti-join; "
    "report size is rules x 1 row regardless of data size",
    tags=("quality", "expectations", "extension"),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    def cnt(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    li_agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        cnt(F.col("l_orderkey").isNull()).alias("v_nn"),
        cnt(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("v_qty"),
        cnt(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("v_disc"),
    )
    ord_agg = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        cnt(~F.col("o_orderstatus").isin("F", "O", "P")).alias("v_status"),
    )
    ev_agg = events.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        cnt(F.col("event_id").isNull()).alias("v_nn"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.col("event_id"))
        ).cast("bigint").alias("v_uniq"),
    )
    orphans = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v_orphan"))
    )
    fk_agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked")
    ).crossJoin(F.broadcast(orphans))

    report = _rule_rows(
        li_agg,
        [
            ("not_null:l_orderkey", "lineitem", "v_nn"),
            ("range:l_quantity:1-50", "lineitem", "v_qty"),
            ("range:l_discount:0-0.1", "lineitem", "v_disc"),
        ],
    )
    report = report.unionByName(
        _rule_rows(
            ord_agg, [("accepted_values:o_orderstatus", "orders", "v_status")]
        )
    )
    report = report.unionByName(
        _rule_rows(
            ev_agg,
            [
                ("not_null:event_id", "events", "v_nn"),
                ("unique:event_id", "events", "v_uniq"),
            ],
        )
    )
    return report.unionByName(
        _rule_rows(
            fk_agg,
            [("referential:lineitem.l_orderkey->orders", "lineitem", "v_orphan")],
        )
    )
