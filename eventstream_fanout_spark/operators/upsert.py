"""CDC apply / merge-upsert — turning a stream of Debezium change
events (op ∈ {c,u,d}) into the current snapshot of the table, the
missing half of the reference's CDC story (the reference only ever
appends inserts/updates to ClickHouse and drops deletes at the null
filter — SURVEY.md §2.3 P5; real warehouses need MERGE semantics).

``latest_change_per_key``: last-wins by (ts, change id) per key — one
window shuffle.  ``apply_cdc_batch``: full-outer merge of the snapshot
with the latest changes; deletes remove, updates replace, inserts
append.  Composable under ``foreachBatch`` for incremental application
(batch-id-keyed snapshot versions at scale, Delta/Iceberg MERGE in a
lakehouse deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key: str,
    order_cols: list[str],
) -> DataFrame:
    """Collapse a change batch to the last change per key (total order
    via ``order_cols`` descending, e.g. [ts, change_id])."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot:

    * ``d``  -> row removed,
    * ``c``/``u`` -> row replaced/inserted with the change's columns.

    ``changes`` must carry ``key``, ``op_col``, ``order_cols``, and the
    snapshot's payload columns.  Returns the new snapshot (same schema
    as ``snapshot``)."""
    latest = latest_change_per_key(changes, key, order_cols)
    payload_cols = [c for c in snapshot.columns if c != key]
    l = latest.select(
        F.col(key).alias("__k"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__new_{c}") for c in payload_cols],
    )
    merged = snapshot.join(l, snapshot[key] == F.col("__k"), "full_outer")
    kept = merged.where(
        F.col("__op").isNull() | (F.col("__op") != F.lit("d"))
    )
    out_cols = [F.coalesce(snapshot[key], F.col("__k")).alias(key)]
    for c in payload_cols:
        out_cols.append(
            F.when(F.col("__op").isNotNull(), F.col(f"__new_{c}"))
            .otherwise(snapshot[c])
            .alias(c)
        )
    return kept.select(*out_cols)
