"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.7 T6 — the reference keeps all state in Redis/receiver
memory; here state lives in Spark's fault-tolerant state store).

``running_user_totals`` maintains a per-user (n_events, total_value)
accumulator across micro-batches and emits the updated totals each time
the user appears — the engine-native version of the reference's
``INCRBY eng10m:{id}`` counter (reference pipeline/app.py:92-95),
checkpointable and replayable instead of fire-and-forget.

The state function is self-contained (imports inside) so cloudpickle
ships it by value to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(key, pdf_iter, state):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user totals with state-store backing.
    On a batch DataFrame, falls back to the equivalent groupBy (same
    output contract) — keeping the batch/streaming duality of the other
    operators."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
