"""Source-builder coverage: S2 (JDBC dimension) end-to-end against an
embedded Derby database, and S1 (Kafka reader) at the unresolved-plan /
option level without a broker.

Derby ships in $SPARK_HOME/jars (Hive metastore dependency), so the
JDBC path is a REAL ``spark.read.format("jdbc")`` roundtrip — write the
dimension over JDBC, read it back through the builder, including a
range-partitioned parallel read (the scale knob the reference omits).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstream_fanout_spark.sources.jdbc import (
    content_dimension,
    jdbc_dimension,
)
from eventstream_fanout_spark.streaming.sources import (
    kafka_options,
    kafka_stream,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "dimdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded_dim(spark, derby_url):
    dim = spark.createDataFrame(
        [(1, "video", 120), (2, "article", None), (3, "video", 300),
         (4, "audio", 45)],
        "id int, content_type string, length_seconds int",
    )
    (
        dim.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "content")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return dim


def test_jdbc_dimension_roundtrip(spark, derby_url, seeded_dim):
    """S2: the reference's exact projection (app.py:60-68) through a
    real JDBC read — key cast to string + renamed, payload columns."""
    got = content_dimension(spark, derby_url, driver=DERBY_DRIVER)
    assert got.columns == ["content_id", "content_type", "length_seconds"]
    rows = {tuple(r) for r in got.collect()}
    assert rows == {
        ("1", "video", 120),
        ("2", "article", None),
        ("3", "video", 300),
        ("4", "audio", 45),
    }


def test_jdbc_partitioned_read(spark, derby_url, seeded_dim):
    """Range-partitioned parallel JDBC read: numPartitions parallel
    range queries, no data loss/duplication at the boundaries."""
    df = jdbc_dimension(
        spark,
        derby_url,
        "content",
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=1,
        upper_bound=5,
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 4
    assert {r["id"] for r in df.select("id").collect()} == {1, 2, 3, 4}


def test_jdbc_pushdown_subquery(spark, derby_url, seeded_dim):
    """dbtable accepts a pushdown subquery — the filter runs in the
    database, not in Spark."""
    df = jdbc_dimension(
        spark,
        derby_url,
        '(SELECT "id", "content_type" FROM content'
        " WHERE CAST(\"content_type\" AS VARCHAR(32)) = 'video') AS t",
        driver=DERBY_DRIVER,
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_jdbc_as_fanout_dim_provider(spark, derby_url, seeded_dim, tmp_path):
    """S2 wired into the fan-out: the per-batch transform loads the
    dimension over JDBC (reference re-reads it every micro-batch,
    app.py:59-66) and broadcast-joins it to the batch."""
    from eventstream_fanout_spark.streaming.fanout import (
        parquet_sink,
        start_fanout,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "b.json").write_text(
        '{"event_id": 10, "content_id": "1"}\n'
        '{"event_id": 11, "content_id": "4"}\n'
    )
    stream = (
        spark.readStream.schema("event_id long, content_id string")
        .json(str(src_dir))
    )

    def enrich(batch_df):
        dim = content_dimension(spark, derby_url, driver=DERBY_DRIVER)
        return batch_df.join(F.broadcast(dim), "content_id", "left")

    out = tmp_path / "out"
    q = start_fanout(
        stream,
        [parquet_sink(str(out))],
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=enrich,
        query_name="jdbc_dim_fanout",
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["content_type"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {(10, "video"), (11, "audio")}


def test_refreshing_dimension_caches_between_boundaries(
    spark, derby_url, seeded_dim
):
    """The cached-dim refresh (SURVEY §7.3 hard part 5): the loader
    runs once per refresh window, not once per batch; an update to the
    source table is invisible until the next boundary and visible
    after it."""
    from eventstream_fanout_spark.sources.jdbc import RefreshingDimension

    def loader():
        return content_dimension(spark, derby_url, driver=DERBY_DRIVER)

    dim = RefreshingDimension(loader, refresh_every=2)
    # five batches, boundary every 2 -> loads at gens 0, 1, 2 only
    for bid in range(4):
        got = dim.get(bid)
        assert got.count() == 4
    assert dim.n_loads == 2  # gens 0 (bids 0-1) and 1 (bids 2-3)

    # mutate the source mid-window: batch 4 is still gen 2's FIRST
    # batch, so it refreshes and sees the change...
    spark.createDataFrame(
        [(9, "video", 60)], "id int, content_type string, length_seconds int"
    ).write.format("jdbc").option("url", derby_url).option(
        "dbtable", "content"
    ).option("driver", DERBY_DRIVER).mode("append").save()
    assert dim.get(4).count() == 5
    assert dim.n_loads == 3
    # ...and batch 5 (same gen) serves the cached snapshot: the loader
    # does not run again even though it WOULD see the same data
    assert dim.get(5).count() == 5
    assert dim.n_loads == 3

    # restore the fixture table for other tests in this module
    conn_df = spark.read.format("jdbc").option("url", derby_url).option(
        "dbtable", '(SELECT * FROM content WHERE "id" <> 9) AS t'
    ).option("driver", DERBY_DRIVER).load()
    conn_df.write.format("jdbc").option("url", derby_url).option(
        "dbtable", "content"
    ).option("driver", DERBY_DRIVER).mode("overwrite").save()


def test_jdbc_sink_idempotent_replay(spark, derby_url, tmp_path):
    """K2-over-JDBC: the fan-out's JDBC warehouse sink is batch-id
    keyed — replaying the same micro-batch DELETEs its own rows first,
    so a crash-replay never duplicates."""
    from eventstream_fanout_spark.sources.jdbc import (
        jdbc_batch_writer,
        jdbc_dimension,
    )
    from eventstream_fanout_spark.streaming.fanout import (
        FanoutSink,
        start_fanout,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "b.json").write_text(
        '{"event_id": 1, "v": 10}\n{"event_id": 2, "v": 20}\n'
    )
    stream = (
        spark.readStream.schema("event_id long, v long").json(str(src_dir))
    )
    writer = jdbc_batch_writer(
        derby_url, "sink_events", driver=DERBY_DRIVER
    )
    q = start_fanout(
        stream,
        [FanoutSink("jdbc_warehouse", writer)],
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="jdbc_sink_fanout",
    )
    q.awaitTermination(120)

    def read_sink():
        return jdbc_dimension(
            spark, derby_url, "sink_events", driver=DERBY_DRIVER
        )

    first = [tuple(r) for r in read_sink().collect()]
    assert sorted((r[0], r[1]) for r in first) == [(1, 10), (2, 20)]

    # simulate a replay of batch 0 (crash between sink and commit):
    # same rows, same batch id -> the sink must overwrite, not append
    batch_df = spark.createDataFrame(
        [(1, 10), (2, 20)], "event_id long, v long"
    )
    writer(batch_df, 0)
    again = [tuple(r) for r in read_sink().collect()]
    assert sorted(again) == sorted(first), "replay duplicated rows"


# --- S1: Kafka reader, broker-free ------------------------------------


def test_kafka_stream_option_plumbing(spark, tmp_path):
    """Route the kafka_stream builder through a Python data source with
    the identical schema whose stream reader EMITS the options it
    received as kafka-shaped rows: draining one availableNow batch
    proves the exact reference options (pipeline/app.py:39-42) flow
    builder -> source resolution -> running stream, without a broker."""
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _OptsEchoReader(DataSourceStreamReader):
        def __init__(self, options):
            self._opts = dict(options)

        def initialOffset(self):
            return {"batch": 0}

        def latestOffset(self):
            return {"batch": 1}

        def partitions(self, start, end):
            return [InputPartition(start["batch"])]

        def read(self, partition):
            import datetime

            if partition.value != 0:
                return
            ts = datetime.datetime(2024, 1, 1)
            for i, (k, v) in enumerate(sorted(self._opts.items())):
                yield (k.encode(), str(v).encode(), "opts", 0, i, ts, 0)

        def commit(self, end):
            pass

    class KafkaStandin(DataSource):
        @classmethod
        def name(cls):
            return "kafka_standin"

        def schema(self):
            return KAFKA_SCHEMA

        def streamReader(self, schema):
            return _OptsEchoReader(self.options)

    try:
        spark.dataSource.register(KafkaStandin)
    except Exception:
        pass  # already registered in this JVM

    df = kafka_stream(
        spark,
        "broker-1:9092,broker-2:9092",
        "cdc.public.engagement_events",
        format="kafka_standin",
    )
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )

    sink = f"kafka_standin_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        bytes(r["key"]).decode(): bytes(r["value"]).decode()
        for r in spark.sql(f"SELECT key, value FROM {sink}").collect()
    }
    for k, v in kafka_options(
        "broker-1:9092,broker-2:9092", "cdc.public.engagement_events"
    ).items():
        assert got.get(k.lower()) == v, (k, got)


def test_kafka_stream_reaches_jvm_source_resolution(spark):
    """With the real format name the builder must fail ONLY on the
    missing connector jar (this container ships none) — i.e. the
    options and plan construction are otherwise sound."""
    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_stream(spark, "broker:9092", "cdc.public.engagement_events")


def test_kafka_stream_through_fanout_end_to_end(spark, tmp_path):
    """The S1 -> K1 composition the reference runs as ONE stream
    (pipeline/app.py:39-113), executed end-to-end: the kafka_stream
    builder (identical options) over a kafka-SHAPED source emitting
    CDC envelopes as value bytes -> P1 binary cast + typed envelope
    parse -> broadcast enrichment -> fan-out to the idempotent
    warehouse sink, with a checkpoint restart proving no reprocessing
    (VERDICT r3 item 7 — the last reference seam never run as one
    stream)."""
    import json as _json
    import uuid

    from pyspark.sql import Row
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    from eventstream_fanout_spark.operators.enrichment import enrich_events
    from eventstream_fanout_spark.sources.cdc import parse_cdc_envelope
    from eventstream_fanout_spark.streaming.fanout import (
        parquet_sink,
        start_fanout,
    )

    class _CdcEnvelopeReader(DataSourceStreamReader):
        """Emits 6 CDC envelopes (2 partitions x 3 offsets) once."""

        def initialOffset(self):
            return {"batch": 0}

        def latestOffset(self):
            return {"batch": 1}

        def partitions(self, start, end):
            if start["batch"] >= end["batch"]:
                return [InputPartition(-1)]
            return [InputPartition(0), InputPartition(1)]

        def read(self, partition):
            import datetime
            import json

            p = partition.value
            if p < 0:
                return
            ts = datetime.datetime(2024, 1, 1)
            for off in range(3):
                eid = p * 3 + off + 1
                env = json.dumps(
                    {
                        "payload": {
                            "op": "c",
                            "after": {
                                "event_id": eid,
                                "ts": f"2024-01-01T00:0{eid}:00.000000Z",
                                "user_id": eid,
                                "event_type": "play",
                                "value": 60000.0 * eid,
                                "props": json.dumps({"k": eid}),
                            },
                            "before": None,
                        }
                    }
                )
                yield (str(eid).encode(), env.encode(), "cdc", p, off, ts, 0)

        def commit(self, end):
            pass

    class KafkaCdcStandin(DataSource):
        @classmethod
        def name(cls):
            return "kafka_cdc_standin"

        def schema(self):
            return KAFKA_SCHEMA

        def streamReader(self, schema):
            return _CdcEnvelopeReader()

    try:
        spark.dataSource.register(KafkaCdcStandin)
    except Exception:
        pass  # already registered in this JVM

    customer = spark.createDataFrame(
        [
            Row(
                c_custkey=i,
                c_name=f"user-{i}",
                c_mktsegment="SEG",
                c_acctbal=1800.0,
            )
            for i in range(1, 7)
        ]
    )
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        raw = kafka_stream(
            spark,
            "broker-1:9092,broker-2:9092",
            "cdc.public.engagement_events",
            starting_offsets="earliest",
            format="kafka_cdc_standin",
        )
        events = parse_cdc_envelope(raw).drop("op")
        q = start_fanout(
            events,
            [parquet_sink(warehouse)],
            checkpoint_dir=ckpt,
            transform=lambda df: enrich_events(df, customer),
            query_name=f"kafka-fanout-{uuid.uuid4().hex[:8]}",
        )
        q.awaitTermination(120)

    run_once()
    rows = {
        r["event_id"]: r for r in spark.read.parquet(warehouse).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    # enrichment really ran on the kafka-shaped rows
    assert rows[1]["c_name"] == "user-1"
    assert rows[1]["engagement_seconds"] == 60.0
    assert rows[1]["prop_k"] == 1

    # restart from the same checkpoint: nothing reprocessed, no growth
    run_once()
    assert spark.read.parquet(warehouse).count() == 6
