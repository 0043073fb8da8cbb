"""Windowed-aggregate / top-k queries — batch forms of the reference's
Redis aggregate layer (SURVEY.md §2.6 W1/W2/W4/W5) over ``events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import (
    US,
    epoch_bucket,
    rolling_count_preceding,
    sliding_counts,
    sql_epoch_bucket,
    topk_per_window,
    tumbling_counts,
)
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# W1 batch form: tumbling 10-minute counts per event_type.
# ---------------------------------------------------------------------------


@register(
    "window_tumbling_10m",
    f"""
    SELECT {sql_epoch_bucket('e.ts', 600)} AS window_start,
           e.event_type,
           COUNT(*) AS n_events
    FROM events e
    GROUP BY 1, 2
    """,
    description="tumbling 10-min event counts per type (reference W1 "
    "documented intent, README.md:95-97)",
    tags=("window", "agg"),
)
def window_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events, "ts", 600, "event_type")


# ---------------------------------------------------------------------------
# Sliding window: 10-minute width, 5-minute slide, per event_type.
# ---------------------------------------------------------------------------


@register(
    "window_sliding_10m_5m",
    f"""
    SELECT make_timestamp(epoch_us({sql_epoch_bucket('e.ts', 300)})
                          - t.i * {300 * US}) AS window_start,
           e.event_type,
           COUNT(*) AS n_events
    FROM events e
    CROSS JOIN (SELECT UNNEST([0, 1]) AS i) t
    GROUP BY 1, 2
    """,
    description="sliding 10-min/5-min event counts per type (W1 sliding form)",
    tags=("window", "agg"),
)
def window_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_counts(events, "ts", 600, 300, "event_type")


# ---------------------------------------------------------------------------
# W2: top-k leaderboard — top 10 users by event count per day
# (reference: Redis ZSET top10m + ZREVRANGE, pipeline/app.py:96-99).
# ---------------------------------------------------------------------------


@register(
    "topk_leaderboard_daily",
    """
    SELECT * FROM (
      SELECT d AS day, user_id, n_events,
             ROW_NUMBER() OVER (PARTITION BY d
                                ORDER BY n_events DESC, user_id ASC) AS rank
      FROM (
        SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS d, e.user_id,
               COUNT(*) AS n_events
        FROM events e
        GROUP BY 1, 2
      )
    ) WHERE rank <= 10
    """,
    description="top-10 leaderboard per day (reference W2: Redis top10m ZSET)",
    tags=("window", "topk"),
)
def topk_leaderboard_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return topk_per_window(daily, 10, ["day"], "n_events", ["user_id"])


# ---------------------------------------------------------------------------
# W1 documented intent, per-row form: rolling count of the same user's
# events in the preceding 10 minutes (RANGE frame).
# ---------------------------------------------------------------------------


@register(
    "rolling_10m_user_count",
    f"""
    SELECT e.event_id, e.user_id, e.ts,
           COUNT(*) OVER (PARTITION BY e.user_id
                          ORDER BY epoch_us(e.ts)
                          RANGE BETWEEN {600 * US} PRECEDING AND CURRENT ROW
                         ) AS n_last_10m
    FROM events e
    """,
    description="per-row rolling 10-min same-user event count (reference W1 "
    "intent; RANGE frame on integer microseconds)",
    tags=("window", "range-frame"),
)
def rolling_10m_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return rolling_count_preceding(events, "ts", "user_id", 600, "n_last_10m")


# ---------------------------------------------------------------------------
# Global top-k: single leaderboard over the whole range —
# TakeOrderedAndProject, no full sort (W2 + W5).
# ---------------------------------------------------------------------------


@register(
    "global_leaderboard_top10",
    """
    SELECT e.user_id, COUNT(*) AS n_events
    FROM events e
    GROUP BY 1
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
    description="global top-10 users by event count (reference ZREVRANGE "
    "top10m 0 9, smoke.sh:31)",
    tags=("topk", "agg"),
)
def global_leaderboard_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Windowed distinct + tumbling hour buckets with an offset, exercising
# bucket arithmetic beyond the trivial epoch alignment.
# ---------------------------------------------------------------------------


@register(
    "hourly_distinct_users",
    f"""
    SELECT {sql_epoch_bucket('e.ts', 3600)} AS window_start,
           COUNT(DISTINCT e.user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events e
    GROUP BY 1
    """,
    description="hourly distinct-user counts (exact distinct aggregate)",
    tags=("window", "distinct"),
)
def hourly_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        epoch_bucket(F.col("ts"), 3600).alias("window_start")
    ).agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Gap-filled time series: a generated hourly spine left-joined to the
# aggregate so empty buckets surface as zero (the shape dashboards and
# downstream ML featurization need; missing from naive GROUP BY).
# ---------------------------------------------------------------------------


@register(
    "gap_filled_hourly_counts",
    f"""
    WITH bounds AS (
      SELECT {sql_epoch_bucket('min(ts)', 3600)} AS lo,
             {sql_epoch_bucket('max(ts)', 3600)} AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start
      FROM bounds
    ),
    agg AS (
      SELECT {sql_epoch_bucket('ts', 3600)} AS window_start,
             COUNT(*) AS n
      FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT s.window_start,
           COALESCE(a.n, 0) AS n_signups
    FROM spine s LEFT JOIN agg a ON a.window_start = s.window_start
    """,
    description="gap-filled hourly time series: generated hour spine "
    "(sequence/generate_series) left-joined to sparse counts, empty "
    "buckets as zero",
    tags=("window", "spine", "agg"),
)
def gap_filled_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        epoch_bucket(F.min("ts"), 3600).alias("lo"),
        epoch_bucket(F.max("ts"), 3600).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    agg = (
        events.where(F.col("event_type") == "signup")
        .groupBy(epoch_bucket(F.col("ts"), 3600).alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(agg, "window_start", "left").select(
        "window_start", F.coalesce("n", F.lit(0)).alias("n_signups")
    )


# ---------------------------------------------------------------------------
# Deterministic string aggregation: sorted collect_list -> joined CSV
# (listagg/string_agg with a pinned order).
# ---------------------------------------------------------------------------


@register(
    "string_agg_top_users",
    """
    SELECT event_type,
           string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id ASC)
             AS top_users_csv
    FROM (
      SELECT * FROM (
        SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id ASC) AS rn
        FROM (SELECT event_type, user_id, COUNT(*) AS n
              FROM events GROUP BY 1, 2)
      ) WHERE rn <= 5
    )
    GROUP BY event_type
    """,
    description="string aggregation with pinned ordering: top-5 users "
    "per event type as a sorted CSV (array_sort(collect_list) in Spark, "
    "ordered string_agg in SQL)",
    tags=("agg", "string-agg"),
)
def string_agg_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("user_id")
    )
    top5 = counts.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 5
    )
    # sort numerically, then stringify (string sort would put 10 < 9)
    return top5.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("user_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("top_users_csv")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — binned distribution profile (the shape every
# data-quality dashboard needs; one partial-aggregatable pass).
# ---------------------------------------------------------------------------


@register(
    "value_histogram",
    """
    SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           CAST(FLOOR(value / 25.0) AS BIGINT) * CAST(25.0 AS DOUBLE)
             AS bin_lo,
           COUNT(*) AS n,
           MIN(value) AS bin_min,
           MAX(value) AS bin_max
    FROM events
    GROUP BY 1
    """,
    description="fixed-width (25-unit) value histogram with per-bin "
    "min/max — single partial-aggregatable pass",
    tags=("agg", "histogram"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return (
        events.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("bin_min"),
            F.max("value").alias("bin_max"),
        )
        .withColumn("bin_lo", F.col("bin") * F.lit(25.0))
        .select("bin", "bin_lo", "n", "bin_min", "bin_max")
    )


# ---------------------------------------------------------------------------
# Approximate distinct (HLL sketch) — engine-specific sketch values, so
# rows-only for the driver; the pytest suite bounds the error vs exact.
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_users",
    None,  # HLL sketches differ per engine; accuracy pinned in pytest
    description="approx_count_distinct (HyperLogLog++) per event type — "
    "the mergeable-sketch path for 100 TB cardinality estimation; "
    "error bound vs exact asserted in tests",
    tags=("window", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_quantiles_value",
    None,  # KLL/GK sketches differ per engine; accuracy pinned in pytest
    description="approx_percentile sketch of event value per event type "
    "(p25/p50/p75/p90/p99, accuracy 10000) exploded to one row per "
    "quantile — the mergeable-sketch path for 100 TB quantile "
    "estimation; rank error bound vs exact asserted in tests",
    tags=("window", "approx", "sketch"),
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pcts = [0.25, 0.5, 0.75, 0.9, 0.99]
    sketched = events.groupBy("event_type").agg(
        F.percentile_approx("value", pcts, 10000).alias("qs")
    )
    labels = F.array(*[F.lit(p) for p in pcts])
    return sketched.select(
        "event_type",
        F.explode(F.arrays_zip(labels.alias("p"), F.col("qs").alias("v"))).alias(
            "z"
        ),
    ).select(
        "event_type",
        F.col("z.p").alias("quantile"),
        F.col("z.v").alias("value_approx"),
    )


# ---------------------------------------------------------------------------
# Sketch algebra (round 3): Apache DataSketches builtins — theta
# sketches give SET OPERATIONS on sketches (union/intersection/
# difference of user sets without materializing them) and HLL sketches
# are mergeable (store per-partition sketches, fold at read — the
# warehouse rollup pattern for 100 TB cardinality).  Sketch bytes are
# engine-specific, so rows-only for the driver; pytest bounds the
# estimates against exact values and pins merge losslessness.
# ---------------------------------------------------------------------------


@register(
    "theta_sketch_user_sets",
    None,  # sketch estimates are engine-specific; bounds in pytest
    description="theta-sketch set algebra over user sets: sketch the "
    "purchase-users and error-users sets independently, then estimate "
    "union / intersection / difference WITHOUT materializing either "
    "set — the distributed set-op path at 100 TB (sketches are bytes, "
    "merge is associative; the exact twin is "
    "set_ops_purchasers_vs_errors)",
    tags=("window", "approx", "sketch", "theta"),
)
def theta_sketch_user_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sketches = events.groupBy().agg(
        F.theta_sketch_agg(
            F.when(
                F.col("event_type") == "purchase", F.col("user_id")
            )
        ).alias("purch"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        ).alias("err"),
    )
    return sketches.select(
        F.round(
            F.theta_sketch_estimate(F.col("purch")), 0
        ).cast("long").alias("purchasers_est"),
        F.round(
            F.theta_sketch_estimate(F.col("err")), 0
        ).cast("long").alias("error_users_est"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_union(F.col("purch"), F.col("err"))
            ),
            0,
        ).cast("long").alias("either_est"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("purch"), F.col("err"))
            ),
            0,
        ).cast("long").alias("both_est"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_difference(F.col("purch"), F.col("err"))
            ),
            0,
        ).cast("long").alias("purch_only_est"),
    )


@register(
    "hll_daily_merge_distinct",
    None,  # sketch estimates are engine-specific; bounds in pytest
    description="mergeable-HLL rollup: per-day HLL sketches of "
    "user_id folded with hll_union_agg to a global distinct estimate "
    "— the store-sketches/merge-on-read warehouse pattern (a rollup "
    "table of sketch bytes re-aggregates to ANY grouping without "
    "rescanning facts); merge losslessness vs the direct single-pass "
    "sketch is pinned in pytest",
    tags=("window", "approx", "sketch", "hll"),
)
def hll_daily_merge_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("distinct_users_merged"),
    )


@register(
    "bitmap_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
    description="EXACT distinct counting via bitmap aggregates — the "
    "exact counterpart of the HLL sketch path: ids bucket by "
    "bitmap_bucket_number (32768 bits per bucket, so any id range "
    "works), per-bucket bitmaps OR-merge associatively, counts sum. "
    "A rollup table of bitmap bytes re-aggregates to any grouping "
    "with NO approximation error and no fact rescan; the oracle is "
    "plain COUNT(DISTINCT), which the bitmaps must equal exactly. "
    "bit_position is 1-based, hence the +1 shift for 0-based ids",
    tags=("window", "bitmap", "distinct", "extension"),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    uid1 = F.col("user_id") + F.lit(1)
    per_bucket = events.groupBy(
        "event_type", F.bitmap_bucket_number(uid1).alias("bucket")
    ).agg(
        F.bitmap_count(
            F.bitmap_construct_agg(F.bitmap_bit_position(uid1))
        ).alias("cnt")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_users")
    )


@register(
    "kll_daily_merge_quantiles",
    None,  # sketch estimates are engine-specific; bounds in pytest
    description="mergeable KLL quantile sketches: per-day sketches of "
    "event value folded pairwise (F.aggregate over the collected "
    "sketch array) into one global sketch — the store-sketches/"
    "merge-on-read path for percentile rollups, same pattern as the "
    "HLL and bitmap rollups but for ranks. The merged sketch's total "
    "count is EXACT (asserted == COUNT(*)); p50/p90/p99 carry the KLL "
    "rank-error bound, bracketed against exact quantiles in pytest",
    tags=("window", "approx", "sketch", "kll"),
)
def kll_daily_merge_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.kll_sketch_agg_double(
            F.nanvl(F.col("value"), F.lit(0.0)), 200
        ).alias("sk")
    )
    arr = daily.agg(F.collect_list("sk").alias("sks"))
    merged = arr.select(
        F.aggregate(
            F.slice(F.col("sks"), 2, F.size("sks") - 1),
            F.element_at(F.col("sks"), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("m")
    )
    return merged.select(
        F.kll_sketch_get_n_double("m").cast("bigint").alias("n_total"),
        F.kll_sketch_get_quantile_double("m", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("m", F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double("m", F.lit(0.99)).alias("p99"),
    )
