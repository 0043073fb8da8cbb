"""Source-format breadth: the engine must ingest the same relation from
parquet, CSV, JSON-lines, and ORC with identical results (schema
applied explicitly for the text formats — schema-on-read like the
reference's CDC path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_fanout_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _norm(df):
    return sorted(
        (
            r["event_id"],
            r["ts"].isoformat(),
            r["user_id"],
            r["event_type"],
            repr(r["value"]),
            r["props"],
        )
        for r in df.select(*COLS).collect()
    )


def test_csv_json_orc_roundtrip(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select(*COLS)
    want = _norm(events)
    schema = events.schema

    csv_path = str(tmp_path / "csv")
    # quote/escape so the JSON-valued props column survives CSV; the
    # CSV text formatter only keeps millisecond precision, so carry the
    # timestamp as epoch microseconds (the realistic CSV shape anyway)
    (
        events.withColumn("ts", F.unix_micros("ts"))
        .write.option("header", True)
        .option("escape", '"')
        .csv(csv_path)
    )
    got_csv = (
        spark.read.schema("event_id long, ts long, user_id long, "
                          "event_type string, value double, props string")
        .option("header", True)
        .option("escape", '"')
        .csv(csv_path)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    assert _norm(got_csv) == want

    json_path = str(tmp_path / "json")
    # JSON writer also truncates to milliseconds; ship the timestamp as
    # an explicit ISO string (exactly what the CDC envelope does)
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    events.withColumn("ts", F.date_format("ts", fmt)).write.json(json_path)
    got_json = (
        spark.read.schema(
            "event_id long, ts string, user_id long, "
            "event_type string, value double, props string"
        )
        .json(json_path)
        .withColumn("ts", F.to_timestamp("ts", fmt))
    )
    assert _norm(got_json) == want

    orc_path = str(tmp_path / "orc")
    events.write.orc(orc_path)
    got_orc = spark.read.orc(orc_path)
    assert _norm(got_orc) == want


def test_schema_evolution_merge(spark, tmp_path):
    """Parquet schema evolution: files with an added column read
    together via mergeSchema, old files yielding NULLs."""
    e = load_table(spark, SF_SMOKE, "events").select(*COLS)
    path = str(tmp_path / "evolving")
    e.where(F.col("event_id") % 2 == 0).write.parquet(f"{path}/v1")
    e.where(F.col("event_id") % 2 == 1).withColumn(
        "new_flag", F.lit(True)
    ).write.parquet(f"{path}/v2")
    merged = spark.read.option("mergeSchema", True).parquet(
        f"{path}/v1", f"{path}/v2"
    )
    assert "new_flag" in merged.columns
    assert merged.count() == e.count()
    nulls = merged.where(F.col("new_flag").isNull()).count()
    assert nulls == e.where(F.col("event_id") % 2 == 0).count()


def test_fanout_processing_time_trigger(spark, tmp_path):
    """start_fanout with the reference's continuous trigger cadence
    (processingTime) processes appended files and stops cleanly."""
    import json as _json
    import os

    from eventstream_fanout_spark.sources.cdc import parse_cdc_envelope
    from eventstream_fanout_spark.streaming.fanout import (
        parquet_sink,
        start_fanout,
    )
    from eventstream_fanout_spark.streaming.sources import json_file_stream

    src = str(tmp_path / "src")
    os.makedirs(src)

    def env(eid):
        return _json.dumps(
            {
                "payload": {
                    "op": "c",
                    "after": {
                        "event_id": eid,
                        "ts": "2024-01-01T00:00:00.000000Z",
                        "user_id": 1,
                        "event_type": "view",
                        "value": 1.0,
                        "props": "{}",
                    },
                }
            }
        )

    with open(f"{src}/f1.jsonl", "w") as fh:
        fh.write(env(1) + "\n")
    out = str(tmp_path / "out")
    q = start_fanout(
        parse_cdc_envelope(json_file_stream(spark, src)).drop("op"),
        [parquet_sink(out)],
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 second"},
        query_name="pt-trigger-test",
    )
    try:
        q.processAllAvailable()
        with open(f"{src}/f2.jsonl", "w") as fh:
            fh.write(env(2) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 2]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema-on-read evolution: a table whose later files gained a
    column must read as the merged schema with NULL back-fill
    (mergeSchema=true) — the warehouse reality of evolving producers;
    pairs with schema_drift_report, which FLAGS the drift upstream."""
    import os

    base = str(tmp_path / "evolved")
    os.makedirs(base)
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(f"{base}/v1")
    spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    ).write.parquet(f"{base}/v2")
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(base)
    )
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", "en")}


def test_custom_pydatasource_batch_and_stream_with_restart(spark, tmp_path):
    """The Spark-4 Python DataSource connector (sources/pydatasource.py):
    batch read is one partition per file; the streaming reader's
    file-cursor offsets survive a checkpointed restart — a second run
    picks up only files added after the committed offset."""
    from eventstream_fanout_spark.sources.pydatasource import (
        CdcJsonlDataSource,
    )

    spark.dataSource.register(CdcJsonlDataSource)
    src = tmp_path / "feed"
    src.mkdir()
    (src / "a-0.jsonl").write_text('{"x":1}\n{"x":2}\n')
    (src / "b-1.jsonl").write_text('{"x":3}\n')

    batch = (
        spark.read.format("cdc_jsonl").option("path", str(src)).load()
    )
    assert batch.rdd.getNumPartitions() == 2
    assert sorted(r["value"] for r in batch.collect()) == [
        '{"x":1}', '{"x":2}', '{"x":3}',
    ]

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # memory sink cannot recover a checkpoint

    def drain():
        q = (
            spark.readStream.format("cdc_jsonl")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 3

    # restart with one NEW file: only its rows arrive (offset cursor
    # replayed from the checkpoint, committed files not re-read)
    (src / "c-2.jsonl").write_text('{"x":4}\n')
    drain()
    got = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert got == ['{"x":1}', '{"x":2}', '{"x":3}', '{"x":4}']
