"""Analytic/window-function breadth: rank family, lag/lead,
sessionization (gap-based), conversion funnel, manual percentile_disc,
pivot, CUBE — the warehouse analytics a complete engine serves
(reference read-path §3.2 generalized).

Every query keeps a total deterministic order inside window frames
(ties broken on unique ids) so the oracle hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.core import davg, dsum, sql_davg, sql_dsum
from ..sources.tables import load_table
from .registry import register

SESSION_GAP_S = 1800  # 30 min


@register(
    "rank_family",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           ROW_NUMBER() OVER w AS bal_row,
           CAST(NTILE(4) OVER w AS INTEGER) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    description="rank/dense_rank/row_number/ntile over per-segment "
    "balance ordering",
    tags=("analytic", "window-fn"),
)
def rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.row_number().over(w).alias("bal_row"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    "lag_lead_deltas",
    """
    SELECT event_id, user_id, ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - LAG(value) OVER w AS value_delta,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT)
             AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    description="lag/lead with per-user event ordering: previous/next "
    "values and inter-event deltas",
    tags=("analytic", "window-fn"),
)
def lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_v = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        prev_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev_v).alias("value_delta"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("us_since_prev"),
    )


@register(
    "sessionize_events",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
                  > {SESSION_GAP_S * 1_000_000}
                  OR LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                    IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new_session) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="gap-based sessionization (30-min inactivity): lag + "
    "cumulative-sum session ids, per-session stats — the batch form of "
    "streaming session windows",
    tags=("analytic", "session", "window-fn"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    is_new = (
        F.when(
            prev_ts.isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(prev_ts))
                > SESSION_GAP_S * 1_000_000
            ),
            1,
        ).otherwise(0)
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        is_new.alias("is_new_session"),
    ).withColumn("session_id", F.sum("is_new_session").over(wcum))
    return sessions.groupBy(
        "user_id", F.col("session_id").cast("bigint").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "session_window_native",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
                  > {SESSION_GAP_S * 1_000_000}
                  OR LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                    IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new_session) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {SESSION_GAP_S} SECONDS AS session_end_padded,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    description="Spark's native session_window (30-min gap) cross-"
    "validated against the lag+cumsum sessionization construction — "
    "the two formulations must produce identical sessions",
    tags=("analytic", "session", "window"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    win = F.session_window(F.col("ts"), f"{SESSION_GAP_S} seconds")
    return (
        e.groupBy(win.alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_padded"),
            "n_events",
        )
    )


@register(
    "conversion_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      COUNT(first_signup) AS n_signed_up,
      COUNT(first_purchase) AS n_purchased,
      COUNT(CASE WHEN first_purchase > first_signup THEN 1 END)
        AS n_converted_after_signup
    FROM firsts
    """,
    description="conversion funnel: first-touch timestamps per stage via "
    "conditional MIN, ordered-conversion count",
    tags=("analytic", "funnel"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count("first_purchase").alias("n_purchased"),
        F.count(
            F.when(F.col("first_purchase") > F.col("first_signup"), 1)
        ).alias("n_converted_after_signup"),
    )


@register(
    "percentile_disc_manual",
    """
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal ASC, c_custkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN c_acctbal END) AS p50_acctbal,
           MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN c_acctbal END) AS p90_acctbal
    FROM ranked
    GROUP BY c_mktsegment
    """,
    description="exact discrete percentiles (p50/p90) via row_number + "
    "count windows — engine-agnostic percentile_disc",
    tags=("analytic", "percentile", "window-fn"),
)
def percentile_disc_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    wall = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    def pick(q: float):
        return F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                F.col("c_acctbal"),
            )
        )

    return ranked.groupBy("c_mktsegment").agg(
        pick(0.5).alias("p50_acctbal"), pick(0.9).alias("p90_acctbal")
    )


@register(
    "pivot_event_types",
    f"""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")}
             AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    description="pivot: per-user event-type count matrix + conditional "
    "revenue sum (Spark pivot() vs CASE-sum oracle)",
    tags=("analytic", "pivot"),
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    # pivot COUNT yields NULL for absent combos; oracle's COUNT(CASE)
    # yields 0 — fill to match.
    purchase_value = e.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                F.lit(0.0)
            ),
            "purchase_value",
        )
    )
    return counts.join(purchase_value, "user_id")


@register(
    "grouping_sets_explicit",
    """
    SELECT n.n_name, c.c_mktsegment,
           CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation,
           CAST(GROUPING(c.c_mktsegment) AS INTEGER) AS g_segment,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
    """,
    description="explicit GROUPING SETS with GROUPING() indicator flags "
    "(via spark.sql over registered views — the SQL entry path)",
    tags=("analytic", "grouping-sets", "sql-api"),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    _lt(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    return spark.sql(
        """
        SELECT n.n_name, c.c_mktsegment,
               CAST(grouping(n.n_name) AS INT) AS g_nation,
               CAST(grouping(c.c_mktsegment) AS INT) AS g_segment,
               COUNT(*) AS n_customers
        FROM gs_customer c JOIN gs_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
        """
    )


@register(
    "explode_outer_rare_tokens",
    """
    WITH toked AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t LIKE 'z%') AS rare
      FROM documents
    ),
    padded AS (
      SELECT doc_id,
             CASE WHEN len(rare) = 0 THEN [CAST(NULL AS VARCHAR)]
                  ELSE rare END AS rare
      FROM toked
    )
    SELECT doc_id, unnest(rare) AS rare_token FROM padded
    """,
    description="explode_outer: docs with no matching tokens survive "
    "with a NULL row (null-preserving lateral expansion)",
    tags=("scalar", "array", "explode"),
)
def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import tokens
    from ..sources.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    rare = F.filter(
        tokens(F.col("text")), lambda t: t.startswith("z")
    )
    return docs.select(
        "doc_id", F.explode_outer(rare).alias("rare_token")
    )


@register(
    "cube_type_band",
    f"""
    SELECT event_type,
           CASE WHEN value < 50 THEN 'small' ELSE 'large' END AS band,
           COUNT(*) AS n_events,
           {sql_davg('value')} AS mean_value
    FROM events
    GROUP BY CUBE (event_type,
                   CASE WHEN value < 50 THEN 'small' ELSE 'large' END)
    """,
    description="CUBE grouping sets over (event_type, value band) with "
    "deterministic means",
    tags=("analytic", "cube", "agg"),
)
def cube_type_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "band", F.when(F.col("value") < 50, "small").otherwise("large")
    )
    return e.cube("event_type", "band").agg(
        F.count(F.lit(1)).alias("n_events"), davg(F.col("value"), "mean_value")
    )


@register(
    "winsorized_values",
    """
    WITH ranked AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE value IS NOT NULL
    ),
    bounds AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                      THEN value END) AS p05,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN value END) AS p95
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value,
           least(greatest(r.value, b.p05), b.p95) AS value_winsorized,
           (r.value < b.p05 OR r.value > b.p95) AS was_clipped
    FROM ranked r JOIN bounds b ON b.event_type = r.event_type
    """,
    description="winsorization (outlier clipping) at exact per-group "
    "p05/p95: discrete percentiles via row_number+count windows, "
    "bounds broadcast back, least/greatest clip — the standard "
    "preprocessing step before numeric features feed a model; no "
    "value leaves its group's observed range",
    tags=("analytic", "percentile", "preprocessing"),
)
def winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wall = Window.partitionBy("event_type")
    ranked = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ranked.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            clipped.alias("value_winsorized"),
            (
                (F.col("value") < F.col("p05"))
                | (F.col("value") > F.col("p95"))
            ).alias("was_clipped"),
        )
    )


@register(
    "unpivot_event_matrix",
    """
    WITH wide AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               AS purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM wide
    UNION ALL
    SELECT user_id, 'view' AS event_type, view AS n FROM wide
    UNION ALL
    SELECT user_id, 'purchase' AS event_type, purchase AS n FROM wide
    """,
    description="unpivot/melt as a first-class relational op: the "
    "per-user event-type count matrix widened by pivot() is melted "
    "back to long form with DataFrame.unpivot (Spark's native melt) — "
    "wide-to-long is the standard reshape before per-metric analysis; "
    "the oracle is the UNION-ALL expansion",
    tags=("analytic", "unpivot", "reshape"),
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["click", "view", "purchase"],
        variableColumnName="event_type",
        valueColumnName="n",
    )


# --- two-level parallel sweep-line (round 5) ---------------------------


def _session_concurrency_oracle() -> str:
    from .registry import QUERIES

    sessions = QUERIES["sessionize_events"].oracle
    return f"""
    WITH sess AS (SELECT session_start, session_end FROM ({sessions})),
    points AS (
      SELECT session_start AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT make_timestamp(epoch_us(session_end) + 1) AS t, -1 AS delta
      FROM sess
    ),
    binned AS (
      SELECT date_trunc('hour', t) AS hour_start, t, delta FROM points
    ),
    cums AS (
      SELECT hour_start, delta,
             CAST(SUM(delta) OVER (
               PARTITION BY hour_start
               ORDER BY t ASC, delta ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM binned
    ),
    bins AS (
      SELECT hour_start,
             CAST(MAX(cum) AS BIGINT) AS max_cum,
             CAST(SUM(delta) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_boundaries
      FROM cums GROUP BY hour_start
    ),
    carried AS (
      SELECT hour_start, max_cum, n_boundaries,
             CAST(COALESCE(SUM(tot) OVER (
               ORDER BY hour_start ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS carry
      FROM bins
    )
    SELECT hour_start,
           CAST(carry + GREATEST(CAST(0 AS BIGINT), max_cum) AS BIGINT)
             AS peak_concurrent,
           n_boundaries
    FROM carried
    """


@register(
    "session_concurrency_sweep",
    _session_concurrency_oracle(),
    description="peak concurrent sessions per hour via a TWO-LEVEL "
    "parallel sweep-line: sessions explode to +1/-1 boundary points, "
    "cumulative sums run partitioned WITHIN each hour bin, and only "
    "the per-bin totals pass through the tiny global carry window "
    "(#hours rows, bounded) — the classic parallel-prefix-scan "
    "decomposition, so the global ordered cumsum a naive sweep needs "
    "never materializes on one partition.  Ties sweep ends before "
    "starts (delta asc) at equal instants; peak includes the carry-in "
    "baseline for bins whose first boundary is an end",
    tags=("analytic", "session", "sweep", "extension"),
)
def session_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize_events(spark, sf_dir)
    points = (
        sess.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("session_start").alias("t"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.timestamp_micros(
                            F.unix_micros("session_end") + 1
                        ).alias("t"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("p")
        )
        .select("p.t", "p.delta")
        .withColumn("hour_start", F.date_trunc("hour", F.col("t")))
    )
    w_in = (
        Window.partitionBy("hour_start")
        .orderBy(F.asc("t"), F.asc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = points.withColumn(
        "cum", F.sum("delta").over(w_in).cast("bigint")
    )
    bins = cums.groupBy("hour_start").agg(
        F.max("cum").cast("bigint").alias("max_cum"),
        F.sum("delta").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
    )
    # second level: the carry window sees one row per HOUR — bounded
    # and tiny by construction (the two-level scan trick; same budget
    # argument as vocab_coverage's capped second level)
    w_carry = Window.orderBy(F.asc("hour_start")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carried = bins.withColumn(
        "carry",
        F.coalesce(F.sum("tot").over(w_carry), F.lit(0)).cast("bigint"),
    )
    return carried.select(
        "hour_start",
        (
            F.col("carry")
            + F.greatest(F.lit(0).cast("bigint"), F.col("max_cum"))
        ).cast("bigint").alias("peak_concurrent"),
        "n_boundaries",
    )


@register(
    "mad_outlier_report",
    """
    WITH ranked AS (
      SELECT event_type, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN value END) AS med
      FROM ranked GROUP BY event_type
    ),
    dev_ranked AS (
      SELECT e.event_type, ABS(e.value - m.med) AS absdev, e.event_id,
             ROW_NUMBER() OVER (PARTITION BY e.event_type
                                ORDER BY ABS(e.value - m.med) ASC,
                                         e.event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY e.event_type) AS n
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN absdev END) AS mad
      FROM dev_ranked GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           MIN(m.med) AS med,
           MIN(d.mad) AS mad,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3.0 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
    description="robust per-group outlier report via median absolute "
    "deviation: exact discrete median (row_number pick, deterministic "
    "tie-break) -> per-row absolute deviation -> exact discrete MAD -> "
    "|x - med| > 3*MAD outlier counts.  The robust complement to the "
    "winsorized/z-score family (immune to the outliers it hunts); two "
    "group-partitioned window passes + broadcast joins of the k-row "
    "med/mad tables, no transcendentals so both engines agree exactly",
    tags=("analytic", "robust", "outlier", "extension"),
)
def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wall = Window.partitionBy("event_type")

    def disc_median(df: DataFrame, col: str, order2: str) -> DataFrame:
        wv = Window.partitionBy("event_type").orderBy(
            F.asc(col), F.asc(order2)
        )
        ranked = df.select(
            "event_type",
            col,
            F.row_number().over(wv).alias("rn"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        return ranked.groupBy("event_type").agg(
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                    F.col(col),
                )
            ).alias(f"{col}_med")
        )

    med = disc_median(
        e.select("event_type", "value", "event_id"), "value", "event_id"
    ).select("event_type", F.col("value_med").alias("med"))
    devs = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "event_id",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("absdev"),
    )
    mad = disc_median(
        devs.select("event_type", "absdev", "event_id"), "absdev", "event_id"
    ).select("event_type", F.col("absdev_med").alias("mad"))
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("absdev") > F.lit(3.0) * F.col("mad"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
