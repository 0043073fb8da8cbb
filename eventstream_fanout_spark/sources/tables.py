"""Parquet table registry over the driver-generated testdata.

Stands in for the reference's two relational sources (Postgres
``content`` dimension + ``engagement_events`` fact, reference
sql/00_init_schema.sql:1-18) plus the TPC-H-ish breadth tables and the
extension tables (documents, embeddings).  See /root/repo/FIXTURES.md.

At 100 TB these would be partitioned/bucketed lakehouse tables; the
loader keeps the path-per-table contract so swapping in a catalog
(``spark.table``) is a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 refuses to
# read natively (PARQUET_TYPE_ILLEGAL).  We read them as raw int64 nanos
# (legacy conf) and truncate to microsecond timestamps — exactly what
# DuckDB's reader does, so oracle parity holds.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    nanos_cols = _NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming (file-source) variant of :func:`load_table` — same
    nanos-timestamp handling, schema pinned from the batch reader."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    nanos_cols = _NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    raw_schema = spark.read.parquet(path).schema
    # The streaming file source requires a directory; select the single
    # table file out of it with a glob filter.
    df = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
