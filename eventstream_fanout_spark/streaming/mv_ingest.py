"""Streaming ingest for the multi-vector (MaxSim) chunk-bucket index.

The foreachBatch sink appends each micro-batch of ``(vec_id,
embedding, label, grp)`` rows into the chunk store, keying the store
batch id off the DATA's group id (``grp + 1``; the frozen build is
batch -1) rather than the trigger counter — so a whole-stream
reprocess from a fresh checkpoint rewrites every partition
byte-identically (chunking and bucketing depend only on the vector
itself), the repo-wide effectively-once contract.

Preconditions shared with the other data-keyed sinks
(graph_ingest/lm_store): each group must arrive WHOLE in one trigger
(one file per group — ``assert_groups_whole`` fails loudly otherwise,
because a group split across triggers would lose its earlier rows to
the (batch_id, bucket) partition overwrite), and exactly one group per
trigger keeps the batch-id derivation single-valued.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.mv_index import ingest_mv_vectors
from .graph_ingest import whole_groups


def mv_ingest_sink(index_path: str):
    """``foreachBatch`` callback ingesting vector batches into the MV
    chunk store; compose with ``writeStream.foreachBatch``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        grps = whole_groups(batch_df)  # census + guard, one pass (r14)
        if len(grps) != 1:
            raise ValueError(
                f"mv_ingest_sink expects one group per trigger, got "
                f"{sorted(grps)}"
            )
        ingest_mv_vectors(
            batch_df.sparkSession,
            index_path,
            batch_df.select("vec_id", "embedding", "label"),
            int(grps[0]) + 1,
        )

    return process
