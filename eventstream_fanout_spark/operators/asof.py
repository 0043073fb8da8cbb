"""As-of (most-recent-prior) join — an operator Spark has no native
primitive for, composed from existing DataFrame ops (the preferred
strategy for custom operators: composition > UDF).

Implementation: union both sides tagged, sort within each partition key
by (event time, side, row id), and carry the right side's payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame.  Left rows then hold the latest right row with
``right_ts <= left_ts`` (ties: right sorts before left → inclusive;
among simultaneous right rows the largest row id wins — total order,
oracle-stable).

Scale: one shuffle on the partition key, one sort — same cost shape as
a window aggregate; no range self-join blowup.  This is the standard
large-scale as-of pattern (union + forward-fill) used for
trade/quote-style alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_col: str,
    ts_col: str,
    id_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Enrich each ``left`` row with the payload of the most recent
    ``right`` row (right.ts <= left.ts) sharing ``partition_col``.
    Both inputs must carry ``partition_col``, ``ts_col``, ``id_col``.
    Left columns pass through; payloads arrive as ``asof_<col>``.

    Caveat: each payload column forward-fills independently, so pass
    columns that are null-free on the right side (or pre-pack them into
    a struct) to guarantee all payloads come from the same right row.
    """
    l_tagged = left.withColumn("__side", F.lit(1))
    for c in payload_cols:
        l_tagged = l_tagged.withColumn(f"__p_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]
        ))
    r_tagged = right.select(
        partition_col,
        ts_col,
        id_col,
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    ).withColumn("__side", F.lit(0))
    # align schemas: left keeps its own columns; right contributes only
    # key/ts/id/payloads (left-only columns become NULL on right rows)
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(l_tagged.dtypes)[c])
            )
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(
            F.unix_micros(F.col(ts_col)),
            F.col("__side"),
            F.col(id_col),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop(
        "__side", *[f"__p_{c}" for c in payload_cols]
    )
