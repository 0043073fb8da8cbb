"""Streaming observability — a ``StreamingQueryListener`` that records
per-micro-batch progress (rows, durations, event-time watermark, state
rows) to a parquet metrics table.

The reference pipeline runs blind: its only runtime signal is stdout
(`reference pipeline/app.py` prints nothing per batch) and the 5 s
visibility budget in its README is asserted by hand.  A production
stream ships exactly this listener: the driver-side progress callback
is already tiny JSON (no data-plane cost), and appending it to a
parquet metrics table makes the latency/volume/watermark history
queryable with the same engine — the monitoring twin of the per-batch
SLA assertions in tests/test_streaming.py.

Driver-side by design: progress events are per-QUERY-per-batch
metadata (a few hundred bytes), not data; the append is one tiny file
per batch and compacts like any other rollup (compact_parquet).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, ts string, "
    "num_input_rows long, trigger_ms long, add_batch_ms long, "
    "watermark string, state_rows long"
)


class MetricsSinkListener(StreamingQueryListener):
    """Append one row per micro-batch progress event to ``path``."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self._spark = spark
        self._path = path

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API name)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        durations = p.get("durationMs", {}) or {}
        state = p.get("stateOperators") or []
        row = (
            p.get("id"),
            p.get("runId"),
            int(p.get("batchId", -1)),
            p.get("timestamp"),
            int(p.get("numInputRows", 0)),
            int(durations.get("triggerExecution", 0)),
            int(durations.get("addBatch", 0)),
            (p.get("eventTime") or {}).get("watermark"),
            int(sum(s.get("numRowsTotal", 0) for s in state)),
        )
        (
            self._spark.createDataFrame([row], PROGRESS_SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(self._path)
        )


def attach_metrics_sink(
    spark: SparkSession, path: str
) -> MetricsSinkListener:
    """Register (and return) a metrics listener; detach with
    ``spark.streams.removeListener(listener)``."""
    listener = MetricsSinkListener(spark, path)
    spark.streams.addListener(listener)
    return listener
