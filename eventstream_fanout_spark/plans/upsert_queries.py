"""CDC apply / merge-upsert query: a synthesized Debezium-style change
batch (inserts, updates incl. multi-change last-wins, deletes) applied
to the customer snapshot — the MERGE semantics the reference's
append-only sink lacks.  The change batch is generated deterministically
from the table itself, identically in Spark and the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import apply_cdc_batch
from ..sources.tables import load_table
from .registry import register


@register(
    "cdc_apply_merge",
    """
    WITH changes AS (
      SELECT c_custkey AS k, 'u' AS op, 1 AS seq,
             c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'u', 2,
             c_name, c_nationkey, c_acctbal + 200.0, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'd', 1,
             CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
             CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
      FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey + 100000, 'c', 1,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 2
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT COALESCE(c.c_custkey, l.k) AS c_custkey,
           CASE WHEN l.op IS NOT NULL THEN l.c_name
                ELSE c.c_name END AS c_name,
           CASE WHEN l.op IS NOT NULL THEN l.c_nationkey
                ELSE c.c_nationkey END AS c_nationkey,
           CASE WHEN l.op IS NOT NULL THEN l.c_acctbal
                ELSE c.c_acctbal END AS c_acctbal,
           CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment
                ELSE c.c_mktsegment END AS c_mktsegment
    FROM customer c
    FULL OUTER JOIN latest l ON c.c_custkey = l.k
    WHERE l.op IS NULL OR l.op <> 'd'
    """,
    description="CDC apply / MERGE: last-wins change collapse + "
    "full-outer upsert (insert/update/delete) of a snapshot — the MERGE "
    "semantics the reference's append-only sink lacks "
    "(operators/upsert.py)",
    tags=("cdc", "merge", "upsert", "extension"),
)
def cdc_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

    def change(filter_mod, op, seq, acct_delta=None, key_shift=0):
        df = c.where(F.col("c_custkey") % 10 == filter_mod)
        if op == "d":
            sel = [
                (F.col("c_custkey") + key_shift).alias("c_custkey"),
                F.lit(op).alias("op"),
                F.lit(seq).alias("seq"),
                F.lit(None).cast("string").alias("c_name"),
                F.lit(None).cast("int").alias("c_nationkey"),
                F.lit(None).cast("double").alias("c_acctbal"),
                F.lit(None).cast("string").alias("c_mktsegment"),
            ]
        else:
            acct = (
                F.col("c_acctbal") + F.lit(float(acct_delta))
                if acct_delta
                else F.col("c_acctbal")
            )
            sel = [
                (F.col("c_custkey") + key_shift).alias("c_custkey"),
                F.lit(op).alias("op"),
                F.lit(seq).alias("seq"),
                F.col("c_name"),
                F.col("c_nationkey"),
                acct.alias("c_acctbal"),
                F.col("c_mktsegment"),
            ]
        return df.select(*sel)

    changes = (
        change(0, "u", 1, acct_delta=100)
        .unionByName(change(0, "u", 2, acct_delta=200))
        .unionByName(change(1, "d", 1))
        .unionByName(change(2, "c", 1, key_shift=100_000))
    )
    return apply_cdc_batch(
        c, changes, key="c_custkey", order_cols=["seq"]
    ).select("c_custkey", *payload)


@register(
    "scd2_dimension_history",
    """
    WITH changes AS (
      SELECT user_id, ts, event_type, value, event_id
      FROM events WHERE event_type IN ('signup', 'purchase')
    )
    SELECT user_id,
           event_id AS change_id,
           event_type AS attr_event_type,
           value AS attr_value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) IS NULL)
             AS is_current
    FROM changes
    """,
    description="SCD Type-2 dimension history: each change record "
    "becomes a versioned row with [valid_from, valid_to) effectivity "
    "and an is_current flag via LEAD over the change sequence — the "
    "standard warehouse dimension-versioning pattern (one shuffle on "
    "the business key, window fn; no self-join)",
    tags=("upsert", "scd2", "warehouse"),
)
def scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    valid_to = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_id").alias("change_id"),
        F.col("event_type").alias("attr_event_type"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH hist AS (
      SELECT user_id,
             event_id AS change_id,
             value AS attr_value,
             ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS valid_to
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    probes AS (
      SELECT event_id AS probe_id, user_id,
             ts + INTERVAL 1 SECOND AS probe_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.probe_id, p.user_id,
           h.change_id, h.attr_value, h.valid_from
    FROM probes p JOIN hist h
      ON p.user_id = h.user_id
     AND h.valid_from <= p.probe_ts
     AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    """,
    description="SCD2 point-in-time lookup — the query the versioned "
    "dimension exists FOR: each click probes the user's profile "
    "version effective at its timestamp (+1s to sit strictly inside "
    "an interval), via business-key equi-join + [valid_from, "
    "valid_to) range predicate.  Plan shape: SortMergeJoin keyed on "
    "user_id with the range as a join filter — the per-key version "
    "count is bounded, so this is NOT an unbounded range join; "
    "half-open intervals make each probe match at most one version",
    tags=("upsert", "scd2", "asof", "warehouse"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    changes = e.where(F.col("event_type").isin("signup", "purchase"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    hist = changes.select(
        "user_id",
        F.col("event_id").alias("change_id"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    probes = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("probe_ts"),
    )
    return (
        probes.join(
            hist,
            (probes["user_id"] == hist["user_id"])
            & (F.col("valid_from") <= F.col("probe_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("probe_ts") < F.col("valid_to"))
            ),
        )
        .select(
            "probe_id",
            probes["user_id"].alias("user_id"),
            "change_id",
            "attr_value",
            "valid_from",
        )
    )


@register(
    "incremental_mv_maintenance",
    """
    WITH base AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_q
      FROM events WHERE event_id % 2 = 0 GROUP BY user_id
    ),
    delta AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_q
      FROM events WHERE event_id % 2 = 1 GROUP BY user_id
    ),
    merged AS (
      SELECT COALESCE(b.user_id, d.user_id) AS user_id,
             CAST(COALESCE(b.n_events, 0) + COALESCE(d.n_events, 0)
                  AS BIGINT) AS n_events,
             CAST(COALESCE(b.sum_q, 0) + COALESCE(d.sum_q, 0)
                  AS BIGINT) AS sum_q
      FROM base b FULL OUTER JOIN delta d ON d.user_id = b.user_id
    ),
    full_recompute AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_q
      FROM events GROUP BY user_id
    )
    SELECT m.user_id, m.n_events, m.sum_q,
           (m.n_events = f.n_events AND m.sum_q = f.sum_q) AS matches_full
    FROM merged m JOIN full_recompute f ON f.user_id = m.user_id
    """,
    description="incremental materialized-view maintenance: a per-user "
    "(count, exact quantized sum) aggregate is maintained by MERGING a "
    "delta batch's partial aggregate into the base MV (full outer join "
    "+ counter addition — the algebraic-aggregate delta-apply every "
    "warehouse MV engine performs on CDC ingest), and the sandwich "
    "column proves row-by-row that the maintained MV equals a full "
    "recompute.  Delta cost scales with the DELTA, not the table; "
    "sums ride nano-quantized BIGINTs so the merge is exactly "
    "associative (the dsum lesson applied to MV state)",
    tags=("upsert", "incremental", "mv", "extension"),
)
def incremental_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    qsum = F.sum(
        F.floor(F.col("value") * F.lit(1e9) + F.lit(0.5)).cast("long")
    ).cast("bigint")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            qsum.alias("sum_q"),
        )

    base = agg(events.where(F.col("event_id") % 2 == 0))
    delta = agg(events.where(F.col("event_id") % 2 == 1))
    b = base.alias("b")
    d = delta.alias("d")
    merged = (
        b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias(
                "user_id"
            ),
            (
                F.coalesce(F.col("b.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce(F.col("b.sum_q"), F.lit(0))
                + F.coalesce(F.col("d.sum_q"), F.lit(0))
            ).cast("bigint").alias("sum_q"),
        )
    )
    full = agg(events).select(
        F.col("user_id"),
        F.col("n_events").alias("f_n"),
        F.col("sum_q").alias("f_s"),
    )
    return merged.join(full, "user_id").select(
        "user_id",
        "n_events",
        "sum_q",
        (
            (F.col("n_events") == F.col("f_n"))
            & (F.col("sum_q") == F.col("f_s"))
        ).alias("matches_full"),
    )
