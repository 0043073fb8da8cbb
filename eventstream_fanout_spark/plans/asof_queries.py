"""As-of and range-join queries — time-alignment operators the
reference doesn't have but a complete event engine needs (SURVEY.md §2.4
notes the reference has exactly one join kind).

The DuckDB oracles reproduce the union + forward-fill formulation
exactly (same ordering, same IGNORE NULLS fill), rather than relying on
engine-native ASOF JOIN whose tie-breaking is unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import register


@register(
    "asof_click_before_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, 1 AS side,
             event_id AS p_event_id, value,
             CAST(NULL AS BIGINT) AS c_event_id,
             CAST(NULL AS DOUBLE) AS c_value
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS side,
             CAST(NULL AS BIGINT) AS p_event_id,
             CAST(NULL AS DOUBLE) AS value,
             event_id AS c_event_id, value AS c_value
      FROM events WHERE event_type = 'click'
    ),
    filled AS (
      SELECT user_id, ts, p_event_id, value, side,
             last_value(c_event_id IGNORE NULLS) OVER w AS asof_event_id,
             last_value(c_value IGNORE NULLS) OVER w AS asof_value
      FROM tagged
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY epoch_us(ts) ASC, side ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT p_event_id AS event_id, user_id, ts, value,
           asof_event_id, asof_value
    FROM filled WHERE side = 1
    """,
    description="as-of join (no native Spark primitive): each purchase "
    "enriched with the user's most recent prior click via union + "
    "forward-fill — one shuffle + sort, no range self-join blowup",
    tags=("asof", "join", "extension"),
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        partition_col="user_id",
        ts_col="ts",
        id_col="event_id",
        payload_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


@register(
    "range_join_click_purchase_1h",
    """
    SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_clicks_prior_1h
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
    description="range (interval) join: clicks within the hour before "
    "each purchase, per user — inequality join condition; at scale, "
    "bucket both sides by coarse time bin first",
    tags=("range-join", "join", "extension"),
)
def range_join_click_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").alias("n_clicks_prior_1h")
    )
