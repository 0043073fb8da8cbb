"""Warehouse table layout — the analogue of the reference's ClickHouse
DDL (MergeTree ``PARTITION BY toYYYYMM(event_ts)``, ``ORDER BY
(content_id, event_ts)``, reference clickhouse/init.sql:20-22), done
the lakehouse way:

* month partitions -> directory partition pruning at scan time;
* ``sortWithinPartitions(key, ts)`` before write -> parquet row-group
  min/max skipping stands in for the MergeTree ORDER BY skip index;
* parquet dictionary encoding stands in for LowCardinality(String).

At 100 TB add bucketing on the join key (``bucketBy``) so repeated
joins/aggregations on it shuffle zero bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_warehouse(
    enriched: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_key: str = "user_id",
    mode: str = "overwrite",
) -> None:
    """Write the enriched table partitioned by event month with
    row-group-friendly intra-partition ordering."""
    (
        enriched.withColumn(
            "event_month", F.date_format(F.col(ts_col), "yyyy-MM")
        )
        .repartition("event_month")
        .sortWithinPartitions(sort_key, ts_col)
        .write.mode(mode)
        .partitionBy("event_month")
        .parquet(path)
    )


def read_warehouse_month(
    spark: SparkSession, path: str, month: str
) -> DataFrame:
    """Month-filtered read — the filter must prune to one partition
    directory (asserted in tests/test_warehouse.py)."""
    return spark.read.parquet(path).where(F.col("event_month") == month)
