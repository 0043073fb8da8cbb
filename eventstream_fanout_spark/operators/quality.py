"""Data-quality expectations — the engine-side analogue of the
reference's SQL CHECK constraints (``content_type``/``event_type`` enum
checks, reference sql/00_init_schema.sql:5,13), which Spark tables
can't enforce declaratively (SURVEY.md §1.2).

``check_expectations`` evaluates named boolean expectations per row and
returns the row-level result plus a violation profile — the
split-and-count pattern DLT expectations popularized, as plain
DataFrame ops (one pass, partial-aggregatable)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_expectations(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """Add one boolean column per expectation plus an overall flag."""
    out = df
    for name, cond in expectations.items():
        out = out.withColumn(f"ok_{name}", F.coalesce(cond, F.lit(False)))
    overall = None
    for name in expectations:
        c = F.col(f"ok_{name}")
        overall = c if overall is None else overall & c
    return out.withColumn("ok_all", overall)


def expectation_profile(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """One row per expectation: pass/violation counts (single
    aggregation pass over the flagged frame)."""
    flagged = with_expectations(df, expectations)
    total = F.count(F.lit(1))
    aggs = [total.alias("n_rows")]
    for name in expectations:
        aggs.append(
            F.sum(F.col(f"ok_{name}").cast("long")).alias(f"pass_{name}")
        )
    aggs.append(F.sum(F.col("ok_all").cast("long")).alias("pass_all"))
    return flagged.agg(*aggs)
