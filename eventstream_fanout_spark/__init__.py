"""eventstream_fanout_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ahmed-badawood/eventstream-fanout.

The reference (surveyed in /root/repo/SURVEY.md) is a CDC event-stream
fan-out pipeline: Kafka CDC source -> enrichment (broadcast left join +
derived columns) -> three sinks (columnar warehouse, rolling 10-minute
leaderboard, idempotent webhook).  This package re-expresses that surface
idiomatically on Spark DataFrames / Structured Streaming, and extends it
with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Layout:
  session    - tuned SparkSession builder (AQE, UTC, arrow, RocksDB state)
  sources/   - parquet table registry, CDC (Debezium) envelope parsing,
               streaming source builders
  functions/ - deterministic scalar/column helpers (rounding, text,
               vectors, hashing)
  operators/ - batch operators: enrichment, windows/top-k, dedup,
               similarity, text analysis, multimodal
  plans/     - the query registry (single source of truth for
               __spark_entry__.queries() / oracle_sql())
  streaming/ - watermarked streaming aggregates, foreachBatch fan-out
               sink multiplexer with batch-id idempotency
"""

__version__ = "0.1.0"
