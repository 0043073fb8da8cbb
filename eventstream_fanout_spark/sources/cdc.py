"""Debezium CDC envelope contract (reference wire format).

The reference consumes Debezium JSON envelopes from Kafka and flattens
them with 7 ``get_json_object`` calls (reference pipeline/app.py:46-52).
Idiomatic Spark is one ``from_json`` with a declared envelope schema +
``select("payload.after.*")`` — typed once, pruned by Catalyst, no
repeated JSON parsing of the same value (the reference parses each
message 7 times).

Envelope shape (FIXTURES.md §3; converter schemas disabled, tombstones
off per reference docker-compose.yml:57-58 / debezium-postgres.json:13):

    {"payload": {"op": "c", "after": {...cols...}, "before": null,
                 "ts_ms": 1704067200000}}

Rows with ``after = null`` (deletes) or unparseable JSON yield NULL
ids and are dropped by the reference's null-reject filter (P5,
app.py:53) — ``parse_cdc_envelope`` keeps that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The "after" image for the driver-testdata events table (stands in for
# the reference's engagement_events — FIXTURES.md §5).
EVENT_AFTER_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),  # ISO-8601 (Debezium ZonedTimestamp)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def envelope_schema(after: T.StructType = EVENT_AFTER_SCHEMA) -> T.StructType:
    payload = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", after),
            T.StructField("after", after),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    return T.StructType([T.StructField("payload", payload)])


TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def to_cdc_json(events: DataFrame, op: str = "c") -> DataFrame:
    """Wrap event rows in the Debezium envelope (synthetic wire format
    for tests — the inverse of :func:`parse_cdc_envelope`)."""
    after = F.struct(
        F.col("event_id"),
        F.date_format("ts", TS_FMT).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    payload = F.struct(
        F.lit(op).alias("op"),
        F.lit(None).cast(EVENT_AFTER_SCHEMA).alias("before"),
        after.alias("after"),
        (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
    )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )


def parse_cdc_envelope(
    raw: DataFrame,
    value_col: str = "value",
    after: T.StructType = EVENT_AFTER_SCHEMA,
) -> DataFrame:
    """Kafka value bytes/strings -> typed event rows.

    P1 (binary->string cast), P2-P4 (typed extraction + timestamp
    parse), P5 (null-reject: deletes & malformed JSON -> dropped).
    """
    parsed = raw.select(
        F.from_json(
            F.col(value_col).cast("string"), envelope_schema(after)
        ).alias("env")
    )
    flat = parsed.select("env.payload.after.*", "env.payload.op")
    return (
        flat.withColumn("ts", F.to_timestamp("ts", TS_FMT))
        .where(F.col("event_id").isNotNull())
    )


def parse_cdc_envelope_variant(
    raw: DataFrame,
    value_col: str = "value",
    after: T.StructType = EVENT_AFTER_SCHEMA,
) -> DataFrame:
    """:func:`parse_cdc_envelope` with the inner semi-structured
    ``props`` payload decoded to a Spark-4 VARIANT column (``props_v``)
    instead of left as a JSON string — the modern alternative to
    downstream ``get_json_object`` chains (reference
    pipeline/app.py:46-52 parses the same string once per field).

    ``try_parse_json`` (not ``parse_json``) on purpose: on a stream a
    single malformed ``props`` must yield a NULL variant (quarantined
    downstream) rather than fail the micro-batch and stall the
    checkpoint.  Per-row expression only — adds zero shuffles to the
    envelope path."""
    base = parse_cdc_envelope(raw, value_col, after)
    return base.withColumn("props_v", F.try_parse_json(F.col("props")))
