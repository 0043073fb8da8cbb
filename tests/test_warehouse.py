"""Warehouse layout tests: month-partitioned write (the ClickHouse
PARTITION BY analogue) must produce partition directories, prune scans
to the filtered month, and round-trip the data exactly."""

from __future__ import annotations

import contextlib
import glob
import io
import os

from pyspark.sql import functions as F

from eventstream_fanout_spark.operators.enrichment import enrich_events
from eventstream_fanout_spark.operators.warehouse import (
    colocated_join,
    read_warehouse_month,
    write_bucketed_table,
    write_warehouse,
)
from eventstream_fanout_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_partitioned_write_and_pruning(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    customer = load_table(spark, SF_SMOKE, "customer")
    enriched = enrich_events(events, customer)
    path = str(tmp_path / "warehouse")
    write_warehouse(enriched, path)

    # partition directories exist (one per event month in the data)
    months = sorted(
        os.path.basename(p).split("=")[1]
        for p in glob.glob(os.path.join(path, "event_month=*"))
    )
    assert months == ["2024-01"]  # sf0.001 spans January 2024

    # round trip: no rows lost, enrichment columns intact
    back = spark.read.parquet(path)
    assert back.count() == enriched.count()
    assert "engagement_pct" in back.columns

    # partition pruning: the month filter must reach PartitionFilters
    df = read_warehouse_month(spark, path, "2024-01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_month" in plan.split("PartitionFilters", 1)[1][:200]

    # a non-existent month scans zero rows via pruning
    assert read_warehouse_month(spark, path, "1999-12").count() == 0


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_compact_parquet_small_files(spark, tmp_path):
    """64 tiny streaming-sink-style files compact to the byte-budgeted
    count with no data change."""
    from eventstream_fanout_spark.operators.warehouse import compact_parquet

    events = load_table(spark, SF_SMOKE, "events")
    fragged = str(tmp_path / "fragged")
    events.repartition(64).write.parquet(fragged)
    assert len(glob.glob(os.path.join(fragged, "part-*"))) == 64

    compacted = str(tmp_path / "compacted")
    n = compact_parquet(spark, fragged, compacted, target_mb=128)
    files = glob.glob(os.path.join(compacted, "part-*"))
    assert len(files) == n and n < 8  # sf0.001 events ≪ 128 MB
    assert spark.read.parquet(compacted).count() == events.count()


def test_zorder_layout_skipping(spark, tmp_path):
    """Sorting by the Z-order key must give row-group locality in BOTH
    dimensions: with one row group per output file, a point predicate
    on either column should touch a small fraction of files (min/max
    skipping proxy, checked via per-file min/max of both columns)."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.warehouse import zorder_value

    events = load_table(spark, SF_SMOKE, "events").where(
        (F.col("user_id") >= 0) & (F.col("value") >= 0.0)
    )
    vbucket = F.floor(F.col("value")).cast("bigint")
    path = str(tmp_path / "zordered")
    (
        events.select("event_id", "user_id", vbucket.alias("vbucket"))
        .withColumn("z", zorder_value(F.col("user_id"), F.col("vbucket"), 16))
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .write.parquet(path)
    )
    stats = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("vbucket").alias("vlo"), F.max("vbucket").alias("vhi"),
        )
        .collect()
    )
    n_files = len(stats)
    assert n_files >= 8
    # a selective range predicate on EITHER dimension overlaps few files
    u_hits = sum(1 for r in stats if r["ulo"] <= 100 <= r["uhi"])
    v_hits = sum(1 for r in stats if r["vlo"] <= 5 <= r["vhi"])
    assert u_hits <= n_files // 2, (u_hits, n_files)
    assert v_hits <= n_files // 2, (v_hits, n_files)


def test_bucketed_join_zero_exchange(spark):
    """The 100 TB fact-fact join story: orders and lineitem bucketed on
    the join key -> SortMergeJoin with ZERO Exchange nodes; the same
    join on plain parquet shuffles both sides.  Results identical."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8,
                         sort_cols=("o_orderkey",))
    write_bucketed_table(lineitem, "lineitem_b", "l_orderkey", 8,
                         sort_cols=("l_orderkey",))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        bucketed = colocated_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey"
        )
        plan = _plan(bucketed)
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        # contrast: identical join on the unbucketed parquet shuffles
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        assert "Exchange" in _plan(plain)

        # correctness: same row count either way
        assert bucketed.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dq_expectations_detect_injected_violations(spark, tmp_path):
    """The expectations report must actually FLAG bad data: inject one
    violation per rule into miniature tables and assert each counter
    catches exactly its own injection (a checker that only ever passes
    on clean data proves nothing)."""
    from pyspark.sql import Row

    from eventstream_fanout_spark.plans.registry import QUERIES

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            Row(l_orderkey=1, l_quantity=10.0, l_discount=0.05),
            Row(l_orderkey=None, l_quantity=5.0, l_discount=0.0),  # nn
            Row(l_orderkey=2, l_quantity=99.0, l_discount=0.0),  # qty
            Row(l_orderkey=3, l_quantity=1.0, l_discount=0.5),  # disc
            Row(l_orderkey=999, l_quantity=2.0, l_discount=0.0),  # orphan
        ]
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [
            Row(o_orderkey=1, o_orderstatus="F"),
            Row(o_orderkey=2, o_orderstatus="O"),
            Row(o_orderkey=3, o_orderstatus="X"),  # accepted_values
        ]
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [
            Row(event_id=1),
            Row(event_id=1),  # unique
            Row(event_id=None),  # not_null
        ]
    ).write.parquet(f"{sf}/events.parquet")

    rows = {
        r["rule"]: r
        for r in QUERIES["dq_expectations_report"].fn(spark, sf).collect()
    }
    assert rows["not_null:l_orderkey"]["n_violations"] == 1
    assert rows["range:l_quantity:1-50"]["n_violations"] == 1
    assert rows["range:l_discount:0-0.1"]["n_violations"] == 1
    assert rows["accepted_values:o_orderstatus"]["n_violations"] == 1
    assert rows["not_null:event_id"]["n_violations"] == 1
    # null event_id counts into COUNT(*) but not COUNT(DISTINCT):
    # 3 rows - 1 distinct non-null value = 2 "non-unique" rows
    assert rows["unique:event_id"]["n_violations"] == 2
    # the NULL l_orderkey row also fails the FK (no orders match)
    assert rows["referential:lineitem.l_orderkey->orders"]["n_violations"] == 2
    assert not any(r["passed"] for r in rows.values())


def test_dq_expectations_clean_at_fixture(spark):
    """On the driver testdata every rule passes (the fixtures are
    constructed clean) — and n_checked matches the table sizes."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    rows = (
        QUERIES["dq_expectations_report"].fn(spark, SF_ORACLE).collect()
    )
    assert len(rows) == 7
    assert all(r["passed"] and r["n_violations"] == 0 for r in rows)
    n_li = load_table(spark, SF_ORACLE, "lineitem").count()
    assert all(
        r["n_checked"] == n_li
        for r in rows
        if r["table_name"] == "lineitem"
    )
