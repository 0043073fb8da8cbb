"""Scale-diagnostic + rollup-cascade queries with DuckDB oracles.

key_skew_report is the planning input for salting/AQE decisions
(SCALE.md); rollup_cascade_daily proves the hypertable-style cascade
(minute -> hour -> day) equals direct aggregation — the associativity
contract incremental rollup maintenance relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.diagnostics import (
    QPCT,
    QVAL,
    key_skew_report,
    rollup_cascade,
)
from ..sources.tables import load_table
from .registry import register


@register(
    "key_skew_report",
    f"""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM per_key
    ),
    top AS (
      SELECT user_id, cnt FROM per_key
      ORDER BY cnt DESC, user_id ASC LIMIT 10
    )
    SELECT t.user_id, t.cnt,
           CAST(FLOOR(t.cnt * {QPCT!r} / s.n_rows) AS BIGINT) AS pct_micro,
           s.n_keys, s.n_rows, s.max_cnt,
           CAST(FLOOR(s.max_cnt * s.n_keys * {QPCT!r} / s.n_rows)
                AS BIGINT) AS skew_ratio_micro
    FROM top t CROSS JOIN stats s
    """,
    description="shuffle-skew diagnostic over events.user_id: top-10 "
    "heavy hitters with ppm share + global max/avg skew ratio — the "
    "measurement that decides plain shuffle vs salting vs AQE skew "
    "handling (two-level agg + TakeOrdered; one-row stats broadcast)",
    tags=("diagnostics", "scale", "extension"),
)
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_report(
        load_table(spark, sf_dir, "events"), "user_id", top_k=10
    )


@register(
    "rollup_cascade_daily",
    f"""
    WITH q AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             date_trunc('minute', ts) AS m,
             event_type,
             CAST(FLOOR(value * {QVAL!r} + 0.5) AS BIGINT) AS qv
      FROM events
    )
    SELECT day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT m) AS BIGINT) AS n_minutes,
           CAST(SUM(qv) AS BIGINT) AS value_micro
    FROM q GROUP BY day, event_type
    """,
    description="hypertable-style continuous-aggregate cascade: minute "
    "rollup from raw, hour from minute, day from hour — measures "
    "quantized to BIGINT micro-units before the first aggregate so the "
    "cascade is exactly associative; the oracle aggregates raw events "
    "directly and must match bit-for-bit",
    tags=("diagnostics", "timeseries", "extension"),
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_cascade(load_table(spark, sf_dir, "events"))
