"""Stream-stream joins (beyond the reference's single stream-batch
join): watermarked interval joins with bounded state.

Spark requires (a) watermarks on both streams and (b) a two-sided time
bound in the join condition so old state can be evicted — without the
bound, both join states grow forever.  With availableNow over a finite
source, the *inner* join's final output equals the batch join, which
is how plans/asof_queries-style oracles can hash-check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join right rows to left rows with the same key where
    ``left_ts - lookback < right_ts <= left_ts``."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] <= left[left_ts])
        & (right[right_ts] > left[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    # keep a single unambiguous key column (the left one)
    return left.join(right, cond, "inner").drop(right[key])
