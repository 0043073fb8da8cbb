"""Windowed aggregation / top-k operators — the batch forms of the
reference's Redis-side aggregate layer (SURVEY.md §2.6 W1/W2):
rolling 10-minute per-key counts and a top-k leaderboard.

The reference approximates the rolling window with Redis TTL counters
(reference pipeline/app.py:89-99); per SURVEY §2.6 we implement the
*documented intent* (true event-time windows, README.md:95-97) — the
streaming layer reuses these with ``withWatermark``.

Scale notes: tumbling/sliding counts are one hash-aggregate shuffle on
(window, key); partial (map-side) aggregation applies since count is
algebraic.  Top-k-per-window uses ``row_number`` over (window) — a
single shuffle on the window key; for a global top-k prefer
``orderBy().limit(k)`` which Spark executes as TakeOrderedAndProject
(no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000  # microseconds per second


def epoch_bucket(ts: Column, width_s: int, offset_s: int = 0) -> Column:
    """Epoch-aligned tumbling bucket start as a timestamp.

    Built from integer microsecond arithmetic (never float) so DuckDB's
    ``make_timestamp((epoch_us(ts) // w) * w)`` reproduces it exactly.
    """
    w = width_s * US
    off = offset_s * US
    us = F.unix_micros(ts) - F.lit(off)
    return F.timestamp_micros((us - (us % F.lit(w)) + F.lit(off)).cast("long"))


def sql_epoch_bucket(ts_expr: str, width_s: int, offset_s: int = 0) -> str:
    w = width_s * US
    off = offset_s * US
    # DuckDB % on bigint matches Spark's % for the non-negative
    # epochs in play; keep the same subtract-modulo formulation.
    return (
        f"make_timestamp((epoch_us({ts_expr}) - {off}) "
        f"- ((epoch_us({ts_expr}) - {off}) % {w}) + {off})"
    )


def tumbling_counts(
    df: DataFrame, ts_col: str, width_s: int, *keys: str
) -> DataFrame:
    """Tumbling-window counts per key (W1 batch form)."""
    win = epoch_bucket(F.col(ts_col), width_s).alias("window_start")
    return df.groupBy(win, *keys).agg(F.count(F.lit(1)).alias("n_events"))


def sliding_counts(
    df: DataFrame, ts_col: str, width_s: int, slide_s: int, *keys: str
) -> DataFrame:
    """Sliding-window counts per key.  Each row lands in width/slide
    windows; we expand with an integer sequence + window-start math
    (semantically identical to ``F.window(ts, width, slide)`` but with
    a flat timestamp column that a SQL oracle can reproduce exactly).
    """
    if width_s % slide_s != 0:
        raise ValueError("width must be a multiple of slide")
    n = width_s // slide_s
    base = epoch_bucket(F.col(ts_col), slide_s)
    expanded = df.withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    win = F.timestamp_micros(
        (F.unix_micros(base) - F.col("__i").cast("long") * F.lit(slide_s * US)).cast(
            "long"
        )
    ).alias("window_start")
    return expanded.groupBy(win, *keys).agg(F.count(F.lit(1)).alias("n_events"))


def topk_per_window(
    df: DataFrame,
    k: int,
    partition_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Deterministic top-k within each partition (W2).  Tiebreak columns
    make ranking total so results are oracle-stable."""
    order = [F.desc(order_col)] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rolling_count_preceding(
    df: DataFrame, ts_col: str, key_col: str, window_s: int, alias: str
) -> DataFrame:
    """Per-row rolling count over the preceding ``window_s`` seconds for
    the same key — the documented-intent semantics of the reference's
    Redis TTL counter (README.md:95-97), as a RANGE frame.

    Ordered on integer microseconds (not the timestamp) so Spark's
    numeric RANGE frame and DuckDB's ``RANGE ... PRECEDING`` agree to
    the microsecond.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_s * US, 0)
    )
    return df.withColumn(alias, F.count(F.lit(1)).over(w))
