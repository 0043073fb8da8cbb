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
    read_warehouse_month,
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
