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
metadata (a few hundred bytes), not data.  Two listener-bus hygiene
rules (ADVICE r5):

* **Buffered writes.**  ``onQueryProgress`` only appends to an
  in-memory list; the parquet append runs every ``flush_every`` events
  and on ``onQueryTerminated``, bounding both listener-bus latency and
  the one-file-per-batch small-file rate (a terminated-flush batch
  folds up to ``flush_every`` progress rows into one file; compact
  further with compact_parquet).
* **Best-effort contract.**  The flush is wrapped: a failing metrics
  write LOGS and drops the buffered rows rather than throwing on the
  listener bus (Spark swallows listener exceptions, so raising would
  just silently gap the table anyway — this makes the gap visible in
  the driver log).  Metrics are monitoring, not data: consumers must
  not assume the table is complete under storage failure.
"""

from __future__ import annotations

import json
import logging
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, ts string, "
    "num_input_rows long, trigger_ms long, add_batch_ms long, "
    "watermark string, state_rows long"
)


class MetricsSinkListener(StreamingQueryListener):
    """Buffer one row per micro-batch progress event; flush batches of
    rows to ``path`` (parquet, append) every ``flush_every`` events and
    at query termination."""

    def __init__(
        self, spark: SparkSession, path: str, flush_every: int = 8
    ) -> None:
        self._spark = spark
        self._path = path
        self._flush_every = max(1, int(flush_every))
        self._buf: list[tuple] = []
        self._lock = threading.Lock()
        # serializes the parquet appends themselves: two concurrent
        # flushes (listener-bus thread + an explicit flush() caller)
        # race on the writer's shared _temporary/0 staging dir and one
        # of them fails the final rename, dropping its rows
        self._flush_lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API name)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.flush()

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
        with self._lock:
            self._buf.append(row)
            ready = len(self._buf) >= self._flush_every
        if ready:
            self.flush()

    def flush(self) -> None:
        """Write any buffered progress rows now (best-effort: a failed
        write logs and DROPS the rows — see module docstring).
        Flushes are serialized so concurrent callers cannot race on
        the parquet writer's staging directory."""
        with self._flush_lock:
            with self._lock:
                rows, self._buf = self._buf, []
            if not rows:
                return
            try:
                (
                    self._spark.createDataFrame(rows, PROGRESS_SCHEMA)
                    .coalesce(1)
                    .write.mode("append")
                    .parquet(self._path)
                )
            except Exception:  # noqa: BLE001 — listener bus must not throw
                log.exception(
                    "metrics flush to %s failed; dropping %d buffered "
                    "progress row(s) (metrics are best-effort)",
                    self._path,
                    len(rows),
                )


def attach_metrics_sink(
    spark: SparkSession, path: str, flush_every: int = 8
) -> MetricsSinkListener:
    """Register (and return) a metrics listener; detach with
    ``spark.streams.removeListener(listener)``.  Call ``.flush()``
    before reading the metrics table if the stream may still be
    running (termination flushes automatically)."""
    listener = MetricsSinkListener(spark, path, flush_every=flush_every)
    spark.streams.addListener(listener)
    return listener
