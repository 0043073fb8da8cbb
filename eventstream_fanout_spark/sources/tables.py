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


# Event-time columns, normalized to TIMESTAMP (LTZ) on load.  The
# driver's generator has shipped two physical encodings across rounds:
#   * parquet TIMESTAMP(NANOS), which Spark 4 refuses to read natively
#     (PARQUET_TYPE_ILLEGAL) — read as raw int64 nanos (legacy conf)
#     and truncate to microsecond timestamps, exactly what DuckDB does;
#   * parquet timestamp[us] with isAdjustedToUTC=false, which Spark
#     loads as TIMESTAMP_NTZ — a type ``withWatermark``/event-time
#     semantics reject outright, so cast to TIMESTAMP.  The cast
#     interprets the naive value in the session timezone and collect()
#     renders it back in the same timezone, so it is value-preserving
#     for oracle parity (DuckDB keeps the naive value as-is).
_EVENT_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _normalize_ts(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) == "bigint":  # nanos-as-long
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def dataset_cache_key(sf_dir: str) -> str:
    """Cache key for process-lifetime fitted artifacts derived from an
    sf_dir (trained tokenizers, persisted indexes, rank stores): the
    dir path PLUS a fingerprint of every file's (relative path,
    mtime_ns, size) under it — r13 ADVICE 4: keying on the path alone
    served a stale segmentation if the tables changed in-process.
    os.stat only, no data read; superseded artifacts are simply
    abandoned in their tempdirs for the process lifetime (bounded by
    how often a dataset mutates mid-process — normally never)."""
    import hashlib

    entries = []
    for root, _dirs, files in os.walk(sf_dir):
        for f in sorted(files):
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append(
                f"{os.path.relpath(p, sf_dir)}:{st.st_mtime_ns}:{st.st_size}"
            )
    digest = hashlib.md5("\n".join(sorted(entries)).encode()).hexdigest()
    return f"{sf_dir}:{digest[:16]}"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ts_cols = _EVENT_TS_COLUMNS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_ts(df, ts_cols)


def load_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming (file-source) variant of :func:`load_table` — same
    nanos-timestamp handling, schema pinned from the batch reader."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ts_cols = _EVENT_TS_COLUMNS.get(name, ())
    if ts_cols:
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
    return _normalize_ts(df, ts_cols)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
