"""The reference's own smoke test (scripts/smoke.sh + FIXTURES.md),
upgraded from eyeball checks to golden assertions, run through this
engine's full streaming stack: CDC envelope -> parse -> broadcast
enrichment with the reference's exact formula -> fan-out to warehouse +
leaderboard.

Reference seed: content ('…0001', 'podcast', length_seconds=1800);
two engagement events (play/60000ms/web, finish/180000ms/ios).
Documented goldens (FIXTURES.md §2, README.md:293-297):
engagement_seconds 60.0 / 180.0; engagement_pct ROUND(60/1800,2)=0.03 /
ROUND(180/1800,2)=0.10; leaderboard top10m = {content …0001: 2}.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from eventstream_fanout_spark.operators.enrichment import with_derived_columns
from eventstream_fanout_spark.sources.cdc import parse_cdc_envelope
from eventstream_fanout_spark.streaming.fanout import (
    leaderboard_sink,
    parquet_sink,
    start_fanout,
)
from eventstream_fanout_spark.streaming.sources import json_file_stream

CONTENT_ID = "00000000-0000-0000-0000-000000000001"


def _seed_envelopes() -> list[str]:
    rows = [
        (1, "11111111-1111-1111-1111-111111111111", "play", 60000, "web"),
        (2, "22222222-2222-2222-2222-222222222222", "finish", 180000, "ios"),
        # SURVEY §7.3 decimal-parity fixture: 90000ms/1800s -> 0.05
        (3, "33333333-3333-3333-3333-333333333333", "play", 90000, "web"),
    ]
    out = []
    for eid, user, etype, duration, device in rows:
        out.append(
            json.dumps(
                {
                    "payload": {
                        "op": "c",
                        "after": {
                            "event_id": eid,
                            "ts": f"2024-01-01T00:0{eid}:00.000000Z",
                            "user_id": None,
                            "event_type": etype,
                            "value": float(duration),  # duration_ms
                            "props": json.dumps(
                                {"content_id": CONTENT_ID,
                                 "user": user, "device": device}
                            ),
                        },
                        "before": None,
                    }
                }
            )
        )
    return out


def test_reference_smoke_goldens(spark, tmp_path):
    src = str(tmp_path / "cdc")
    os.makedirs(src)
    with open(f"{src}/seed.jsonl", "w") as fh:
        fh.write("\n".join(_seed_envelopes()) + "\n")

    content_dim = spark.createDataFrame(
        [Row(content_id=CONTENT_ID, slug="how-to-start",
             title="How to Start", content_type="podcast",
             length_seconds=1800)]
    )
    warehouse = str(tmp_path / "warehouse")
    board = str(tmp_path / "board")

    def enrich(batch_df):
        parsed = batch_df.withColumn(
            "content_id", F.get_json_object("props", "$.content_id")
        ).withColumn("device", F.get_json_object("props", "$.device"))
        joined = parsed.join(
            F.broadcast(content_dim), "content_id", "left"
        )
        # the reference's exact formula: ROUND((ms/1000)/length, 2)
        return with_derived_columns(
            joined, value_col="value", denom_col="length_seconds",
            pct_scale=1.0 / 1000.0,
        )

    def board_write(df, bid):
        counts = df.groupBy(
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias(
                "window_start"
            ),
            "content_id",
        ).agg(F.count(F.lit(1)).alias("n_events"))
        leaderboard_sink(board, 10, "content_id").write(counts, bid)

    from eventstream_fanout_spark.streaming.fanout import FanoutSink

    from eventstream_fanout_spark.operators.enrichment import warehouse_typed

    stream = parse_cdc_envelope(json_file_stream(spark, src)).drop("op")
    q = start_fanout(
        stream,
        [
            parquet_sink(warehouse, project=warehouse_typed),
            FanoutSink("board", board_write),
        ],
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=enrich,
        query_name="reference-smoke",
    )
    q.awaitTermination(120)

    wh = spark.read.parquet(warehouse)
    rows = {r["event_id"]: r for r in wh.collect()}
    assert set(rows) == {1, 2, 3}
    # golden derived values from the reference docs
    assert rows[1]["engagement_seconds"] == 60.0
    assert rows[2]["engagement_seconds"] == 180.0
    # sink parity: engagement_pct lands as Decimal(5,2), the type the
    # reference warehouse DDL declares (clickhouse/init.sql:14)
    from decimal import Decimal

    assert dict(wh.dtypes)["engagement_pct"] == "decimal(5,2)"
    assert rows[1]["engagement_pct"] == Decimal("0.03")
    assert rows[2]["engagement_pct"] == Decimal("0.10")
    assert rows[3]["engagement_pct"] == Decimal("0.05")  # SURVEY §7.3
    assert rows[1]["content_type"] == "podcast"
    assert rows[1]["device"] == "web" and rows[2]["device"] == "ios"

    # leaderboard golden: {content …0001: N events} at rank 1
    lb = spark.read.parquet(board).collect()
    assert len(lb) == 1
    assert lb[0]["content_id"] == CONTENT_ID
    assert lb[0]["n_events"] == 3
    assert lb[0]["rank"] == 1


def test_parquet_sink_batch_replay_idempotent(spark, tmp_path):
    """Replaying the same batch id must overwrite, not duplicate (T7)."""
    path = str(tmp_path / "wh")
    sink = parquet_sink(path)
    df = spark.range(5).withColumnRenamed("id", "event_id")
    sink.write(df, 7)
    sink.write(df, 7)  # replay
    assert spark.read.parquet(path).count() == 5
    sink.write(df, 8)  # a new batch appends
    assert spark.read.parquet(path).count() == 10


def test_registry_front_window_valid():
    """The 50-slot driver-evidence window: FRONT must be exactly 50
    known, distinct names and lead the ordered registry (a typo here
    silently costs a query its correctness evidence — ordered_queries
    raises on unknown/duplicate names, pinned here)."""
    from eventstream_fanout_spark.plans.registry import (
        FRONT,
        QUERIES,
        ordered_queries,
    )

    assert len(FRONT) == 50
    assert len(set(FRONT)) == 50
    assert set(FRONT) <= set(QUERIES)
    ordered = list(ordered_queries())
    assert ordered[: len(FRONT)] == FRONT
    assert len(ordered) == len(QUERIES)


def test_dataset_cache_key_tracks_file_changes(tmp_path):
    """r13 ADVICE 4: the fitted-artifact caches key on a dataset
    fingerprint, not the bare path — touching any file under the
    sf_dir must change the key; an untouched dir must not."""
    import os
    import time

    from eventstream_fanout_spark.sources.tables import dataset_cache_key

    d = tmp_path / "sf"
    d.mkdir()
    f = d / "documents.parquet"
    f.write_bytes(b"v1")
    k1 = dataset_cache_key(str(d))
    assert k1 == dataset_cache_key(str(d))
    ts = time.time() + 2
    f.write_bytes(b"v2+")
    os.utime(f, (ts, ts))
    assert dataset_cache_key(str(d)) != k1
