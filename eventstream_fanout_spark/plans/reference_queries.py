"""Queries covering the reference's own operator surface
(SURVEY.md §2.1-§2.5, §2.8): scans, JSON extraction, casts, null
filters, the broadcast left-outer enrichment join, derived columns with
exact NULL/round semantics, and the sink projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import sql_round_half_up
from ..operators.enrichment import enrich_events, parse_props
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: the reference's entire per-batch computation as one query
# (P1-P8 + J1 + D1-D3 + K2 projection; reference pipeline/app.py:44-86).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
SELECT
  e.event_id,
  e.ts,
  e.user_id,
  e.event_type,
  e.value,
  CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS prop_k,
  c.c_name,
  c.c_mktsegment,
  c.c_acctbal,
  CASE WHEN e.value IS NULL THEN NULL
       ELSE CAST(e.value / 1000.0 AS DOUBLE) END AS engagement_seconds,
  CASE WHEN e.value IS NULL OR c.c_acctbal IS NULL OR c.c_acctbal = 0.0
       THEN NULL
       ELSE {sql_round_half_up('(100.0 * e.value) / c.c_acctbal', 2)}
       END AS engagement_pct
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_id IS NOT NULL
"""


@register(
    "flagship_enrich",
    _FLAGSHIP_ORACLE,
    description=(
        "CDC-event enrichment: JSON prop extraction, null filter, broadcast "
        "left join to dimension, NULL-preserving derived columns "
        "(reference pipeline/app.py:44-86)"
    ),
    tags=("reference", "join", "json", "derived"),
)
def flagship_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return enrich_events(events, customer)


# ---------------------------------------------------------------------------
# P2/P3: JSON path extraction + typed cast in isolation (app.py:46-52).
# ---------------------------------------------------------------------------


@register(
    "json_extract_props",
    """
    SELECT e.event_id,
           CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS prop_k,
           json_extract_string(e.props, '$.missing') AS prop_missing
    FROM events e
    """,
    description="get_json_object path extraction + cast, incl. missing path "
    "-> NULL (reference app.py:46-52)",
    tags=("reference", "json"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


# ---------------------------------------------------------------------------
# P5: null-rejecting filter (app.py:53) — drops rows whose extracted id
# is NULL (malformed payloads / CDC deletes).  Synthesised malformed rows:
# events with prop_k above a threshold are "malformed" via a NULLIF.
# ---------------------------------------------------------------------------


@register(
    "null_reject_filter",
    """
    SELECT * FROM (
      SELECT e.event_id,
             CASE WHEN CAST(json_extract_string(e.props, '$.k') AS INTEGER) < 90
                  THEN CAST(json_extract_string(e.props, '$.k') AS INTEGER)
                  ELSE NULL END AS prop_k_valid
      FROM events e
    ) WHERE prop_k_valid IS NOT NULL
    """,
    description="null-rejecting filter over extracted field (reference app.py:53)",
    tags=("reference", "filter"),
)
def null_reject_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = parse_props(load_table(spark, sf_dir, "events"))
    k = F.col("prop_k")
    valid = F.when(k < 90, k).otherwise(F.lit(None).cast("int"))
    return (
        events.select("event_id", valid.alias("prop_k_valid"))
        .where(F.col("prop_k_valid").isNotNull())
    )


# ---------------------------------------------------------------------------
# P4: timestamp parse round-trip (app.py:50 parses Debezium ISO-8601
# strings with to_timestamp).  Format the real ts to a string and parse
# it back — exercises both directions deterministically.
# ---------------------------------------------------------------------------


@register(
    "timestamp_parse",
    """
    SELECT e.event_id,
           strftime(e.ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
           CAST(strptime(strftime(e.ts, '%Y-%m-%dT%H:%M:%S.%f'),
                         '%Y-%m-%dT%H:%M:%S.%f') AS TIMESTAMP) AS ts_parsed
    FROM events e
    """,
    description="ISO-8601 string <-> timestamp round-trip (reference app.py:50)",
    tags=("reference", "timestamp"),
)
def timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    iso = F.date_format("ts", fmt)
    return events.select(
        "event_id",
        iso.alias("ts_iso"),
        F.to_timestamp(iso, fmt).alias("ts_parsed"),
    )


# ---------------------------------------------------------------------------
# W4/W5: verification read path — count(*) and sort+limit
# (reference scripts/smoke.sh:27-31, README.md:208-225).
# ---------------------------------------------------------------------------


@register(
    "count_star",
    "SELECT COUNT(*) AS n FROM events",
    description="count(*) verification read (reference smoke.sh:28)",
    tags=("reference", "agg"),
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n"))


@register(
    "sort_limit_latest",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 5
    """,
    description="ORDER BY ts DESC LIMIT 5 verification read "
    "(reference README.md:216-220); event_id tiebreak for determinism",
    tags=("reference", "sort"),
)
def sort_limit_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(5)
    )
