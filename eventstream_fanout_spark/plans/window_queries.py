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
# Approximate distinct (HLL sketch) — sandwich-checked like the other
# sketch rollups: exact value + within-bound boolean are what the
# oracle hashes; the estimate itself stays engine-specific.
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS hllpp_within_10pct
    FROM events
    GROUP BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++) per event type — "
    "the mergeable-sketch path for 100 TB cardinality estimation.  "
    "SANDWICH-checked (round 4, same pattern as the datasketches "
    "rollups): output carries the EXACT per-type distinct count and a "
    "boolean asserting the rsd=0.02 estimate is within 10% (5 sigma) "
    "— the bound is oracle-hashed; the estimate error is additionally "
    "bounded at 10% relative in pytest",
    tags=("window", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    both = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return both.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(
                F.lit(0.10) * F.col("exact_users"), F.lit(1.0)
            )
        ).alias("hllpp_within_10pct"),
    )


def _exact_rank_brackets(
    df, val: "F.Column", keys: list[str], pcts: list[float], margin: float
):
    """Exact rank-bracket values per (keys, quantile): the data elements
    at 1-based ranks ``floor((p-margin)*n)`` and ``ceil((p+margin)*n)``
    — the sandwich an approximate-quantile estimate must land inside.

    Scale shape: global ranks come from the bucket-prefix two-level
    algebra (``floor(v)`` range-buckets preserve value order, so
    rank = bucket offset + local rank) — no single-partition window
    over the fact table; the offset window runs over per-bucket
    aggregate rows only.  Bracket values are actual data elements (no
    interpolation arithmetic), so Spark and a SQL oracle agree on them
    bit-for-bit."""
    from pyspark.sql import Window

    vals = df.select(*keys, val.alias("v")).withColumn(
        "vb", F.floor(F.col("v")).cast("long")
    )
    w_local = Window.partitionBy(*keys, "vb").orderBy("v")
    local = vals.withColumn("lr", F.row_number().over(w_local))
    per_b = vals.groupBy(*keys, "vb").agg(F.count(F.lit(1)).alias("c"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per_b.select(
        *keys,
        "vb",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
    )
    sizes = per_b.groupBy(*keys).agg(F.sum("c").cast("long").alias("n"))
    ranked = local.join(F.broadcast(offs), [*keys, "vb"]).withColumn(
        "rk", (F.col("off") + F.col("lr")).cast("long")
    )
    specs = sizes.crossJoin(
        F.broadcast(
            local.sparkSession.range(1).select(
                F.explode(F.array(*[F.lit(p) for p in pcts])).alias(
                    "quantile"
                )
            )
        )
    ).select(
        *keys,
        "quantile",
        "n",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.col("quantile") - F.lit(margin)) * F.col("n")).cast(
                "long"
            ),
        ).alias("lo_rk"),
        F.least(
            F.col("n"),
            F.ceil((F.col("quantile") + F.lit(margin)) * F.col("n")).cast(
                "long"
            ),
        ).alias("hi_rk"),
    )
    lo = (
        ranked.join(
            F.broadcast(specs.withColumnRenamed("lo_rk", "rk")),
            [*keys, "rk"],
        )
        .select(*keys, "quantile", "n", F.col("v").alias("lo_exact"))
    )
    hi = (
        ranked.join(
            F.broadcast(specs.withColumnRenamed("hi_rk", "rk")),
            [*keys, "rk"],
        )
        .select(*keys, "quantile", F.col("v").alias("hi_exact"))
    )
    return lo.join(hi, [*keys, "quantile"])


def _sql_rank_brackets(
    val_sql: str, keys: list[str], pcts: list[float], margin: float
) -> str:
    """DuckDB twin of :func:`_exact_rank_brackets` (plain ROW_NUMBER —
    the oracle needn't scale)."""
    part = f"PARTITION BY {', '.join(keys)}" if keys else ""
    keysel = "".join(f"{k}, " for k in keys)
    keyjoin = " AND ".join(f"r.{k} = s.{k}" for k in keys) or "TRUE"
    pvals = ", ".join(f"(CAST({p} AS DOUBLE))" for p in pcts)
    return f"""
    vraw AS (SELECT {keysel}{val_sql} AS v FROM events),
    vr AS (
      SELECT {keysel}v,
             ROW_NUMBER() OVER ({part} ORDER BY v) AS rk
      FROM vraw
    ),
    vn AS (
      SELECT {keysel}CAST(COUNT(*) AS BIGINT) AS n FROM vraw
      {('GROUP BY ' + ', '.join(keys)) if keys else ''}
    ),
    q(quantile) AS (VALUES {pvals}),
    spec AS (
      SELECT {"".join(f"vn.{k}, " for k in keys)}vn.n, q.quantile,
             GREATEST(1, CAST(FLOOR((q.quantile - {margin}) * vn.n)
                              AS BIGINT)) AS lo_rk,
             LEAST(vn.n, CAST(CEIL((q.quantile + {margin}) * vn.n)
                              AS BIGINT)) AS hi_rk
      FROM vn, q
    ),
    brackets AS (
      SELECT {"".join(f"s.{k}, " for k in keys)}s.quantile, s.n,
             MAX(CASE WHEN r.rk = s.lo_rk THEN r.v END) AS lo_exact,
             MAX(CASE WHEN r.rk = s.hi_rk THEN r.v END) AS hi_exact
      FROM spec s JOIN vr r ON {keyjoin}
      GROUP BY {"".join(f"s.{k}, " for k in keys)}s.quantile, s.n
    )
    """


@register(
    "approx_quantiles_value",
    f"""
    WITH {_sql_rank_brackets(
        "CASE WHEN isnan(value) THEN 0.0 ELSE value END",
        ["event_type"], [0.25, 0.5, 0.75, 0.9, 0.99], 0.02,
    )}
    SELECT event_type, quantile, lo_exact, hi_exact,
           TRUE AS within_bound
    FROM brackets
    """,
    description="approx_percentile sketch of event value per event type "
    "(p25/p50/p75/p90/p99, accuracy 10000), SANDWICH-checked: the "
    "output carries the exact rank-bracket elements at p±0.02 and a "
    "boolean asserting the estimate landed inside — the bound (not the "
    "engine-specific estimate) is what the oracle hash-checks, so the "
    "sketch's rank-error guarantee (1/accuracy << 0.02) gets real "
    "driver evidence instead of a rows-only pass",
    tags=("window", "approx", "sketch"),
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NaN coerced to 0.0 on BOTH engines (like the KLL twin): Spark
    # buckets NaN via floor(NaN)=0 mid-order while DuckDB sorts NaN
    # last, so raw NaN would break rank parity the day the fixture
    # grows one
    events = load_table(spark, sf_dir, "events")
    pcts = [0.25, 0.5, 0.75, 0.9, 0.99]
    clean_value = F.nanvl(F.col("value"), F.lit(0.0))
    sketched = events.groupBy("event_type").agg(
        F.percentile_approx(clean_value, pcts, 10000).alias("qs")
    )
    labels = F.array(*[F.lit(p) for p in pcts])
    est = sketched.select(
        "event_type",
        F.explode(
            F.arrays_zip(labels.alias("p"), F.col("qs").alias("v"))
        ).alias("z"),
    ).select(
        "event_type",
        F.col("z.p").alias("quantile"),
        F.col("z.v").alias("value_approx"),
    )
    brackets = _exact_rank_brackets(
        events, clean_value, ["event_type"], pcts, 0.02
    )
    return brackets.join(
        F.broadcast(est), ["event_type", "quantile"]
    ).select(
        "event_type",
        "quantile",
        "lo_exact",
        "hi_exact",
        (
            (F.col("value_approx") >= F.col("lo_exact"))
            & (F.col("value_approx") <= F.col("hi_exact"))
        ).alias("within_bound"),
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
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(p) AS BIGINT) AS purchasers_exact,
           CAST(SUM(e) AS BIGINT) AS error_users_exact,
           CAST(SUM(CASE WHEN p = 1 OR e = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS either_exact,
           CAST(SUM(p * e) AS BIGINT) AS both_exact,
           CAST(SUM(CASE WHEN p = 1 AND e = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS purch_only_exact,
           TRUE AS theta_within_5pct
    FROM per_user
    """,
    description="theta-sketch set algebra over user sets: sketch the "
    "purchase-users and error-users sets independently, then estimate "
    "union / intersection / difference WITHOUT materializing either "
    "set — the distributed set-op path at 100 TB (sketches are bytes, "
    "merge is associative).  SANDWICH-checked (upgraded from "
    "rows-only, VERDICT r3 item 6): output carries the EXACT set-op "
    "cardinalities plus a boolean asserting every theta estimate is "
    "within 5% (default lgK=12 gives ~3*1/sqrt(4096) ≈ 4.7% at 3σ; "
    "below 4096 distinct the sketch is exact-mode) — the bound is "
    "what the oracle hash-checks",
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
    est = sketches.select(
        F.theta_sketch_estimate(F.col("purch")).alias("purch_e"),
        F.theta_sketch_estimate(F.col("err")).alias("err_e"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("purch"), F.col("err"))
        ).alias("either_e"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("purch"), F.col("err"))
        ).alias("both_e"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("purch"), F.col("err"))
        ).alias("only_e"),
    )
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    is_e = F.when(F.col("event_type") == "error", 1).otherwise(0)
    per_user = events.groupBy("user_id").agg(
        F.max(is_p).alias("p"), F.max(is_e).alias("e")
    )
    exact = per_user.agg(
        F.sum("p").cast("bigint").alias("purchasers_exact"),
        F.sum("e").cast("bigint").alias("error_users_exact"),
        F.sum(
            F.when((F.col("p") == 1) | (F.col("e") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("either_exact"),
        F.sum(F.col("p") * F.col("e")).cast("bigint").alias("both_exact"),
        F.sum(
            F.when((F.col("p") == 1) & (F.col("e") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("purch_only_exact"),
    )

    def ok(e: str, x: str):  # |est - exact| <= max(5% of exact, 1)
        return F.abs(F.col(e) - F.col(x)) <= F.greatest(
            F.lit(0.05) * F.col(x), F.lit(1.0)
        )

    return exact.crossJoin(F.broadcast(est)).select(
        "purchasers_exact",
        "error_users_exact",
        "either_exact",
        "both_exact",
        "purch_only_exact",
        (
            ok("purch_e", "purchasers_exact")
            & ok("err_e", "error_users_exact")
            & ok("either_e", "either_exact")
            & ok("both_e", "both_exact")
            & ok("only_e", "purch_only_exact")
        ).alias("theta_within_5pct"),
    )


@register(
    "hll_daily_merge_distinct",
    """
    SELECT CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
             AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS distinct_users_exact,
           TRUE AS hll_within_5pct
    FROM events
    """,
    description="mergeable-HLL rollup: per-day HLL sketches of "
    "user_id folded with hll_union_agg to a global distinct estimate "
    "— the store-sketches/merge-on-read warehouse pattern (a rollup "
    "table of sketch bytes re-aggregates to ANY grouping without "
    "rescanning facts).  SANDWICH-checked (upgraded from rows-only, "
    "VERDICT r3 item 6): output carries the EXACT distinct count and "
    "a boolean asserting the merged estimate is within 5% "
    "(lgConfigK=14 → rsd ≈ 0.8%, 5% ≈ 6σ) — the bound is what the "
    "oracle hash-checks; merge losslessness stays pinned in pytest",
    tags=("window", "approx", "sketch", "hll"),
)
def hll_daily_merge_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    merged = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("double")
        .alias("est"),
    )
    exact = events.agg(
        F.countDistinct("user_id").cast("bigint").alias(
            "distinct_users_exact"
        )
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "distinct_users_exact",
        (
            F.abs(F.col("est") - F.col("distinct_users_exact"))
            <= F.greatest(
                F.lit(0.05) * F.col("distinct_users_exact"), F.lit(1.0)
            )
        ).alias("hll_within_5pct"),
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
    f"""
    WITH {_sql_rank_brackets(
        "CASE WHEN isnan(value) THEN 0.0 ELSE value END",
        [], [0.5, 0.9, 0.99], 0.03,
    )}
    SELECT quantile, lo_exact, hi_exact, n AS n_total,
           TRUE AS within_bound
    FROM brackets
    """,
    description="mergeable KLL quantile sketches: per-day sketches of "
    "event value folded pairwise (F.aggregate over the collected "
    "sketch array) into one global sketch — the store-sketches/"
    "merge-on-read path for percentile rollups, same pattern as the "
    "HLL and bitmap rollups but for ranks.  SANDWICH-checked "
    "(upgraded from rows-only, VERDICT r3 item 6): one row per "
    "quantile carrying the exact rank-bracket elements at p±0.03 "
    "(k=200 → rank error ≈ 1.7%), the EXACT total count (the merged "
    "sketch's n must equal COUNT(*)), and the within-bracket boolean "
    "— all oracle-hashable.  The empty-input fold is guarded "
    "(F.size > 0), per ADVICE r3: empty events yields zero rows, not "
    "an array-index error",
    tags=("window", "approx", "sketch", "kll"),
)
def kll_daily_merge_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pcts = [0.5, 0.9, 0.99]
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.kll_sketch_agg_double(
            F.nanvl(F.col("value"), F.lit(0.0)), 200
        ).alias("sk")
    )
    arr = daily.agg(F.collect_list("sk").alias("sks"))
    merged = arr.select(
        F.when(
            F.size("sks") > 0,
            F.aggregate(
                F.slice(F.col("sks"), 2, F.size("sks") - 1),
                F.element_at(F.col("sks"), 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ),
        ).alias("m")
    ).where(F.col("m").isNotNull())
    est = merged.select(
        F.kll_sketch_get_n_double("m").cast("bigint").alias("sk_n"),
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in pcts]).alias("p"),
                F.array(
                    *[
                        F.kll_sketch_get_quantile_double("m", F.lit(p))
                        for p in pcts
                    ]
                ).alias("v"),
            )
        ).alias("z"),
    ).select(
        "sk_n",
        F.col("z.p").alias("quantile"),
        F.col("z.v").alias("est"),
    )
    brackets = _exact_rank_brackets(
        events, F.nanvl(F.col("value"), F.lit(0.0)), [], pcts, 0.03
    )
    return brackets.join(F.broadcast(est), ["quantile"]).select(
        "quantile",
        "lo_exact",
        "hi_exact",
        F.col("n").cast("bigint").alias("n_total"),
        (
            (F.col("sk_n") == F.col("n"))
            & (F.col("est") >= F.col("lo_exact"))
            & (F.col("est") <= F.col("hi_exact"))
        ).alias("within_bound"),
    )
