"""Incremental inverted-index ingestion — the generational-store
pattern (corpus_dedup / ann_ingest) applied to text retrieval.

New documents stream in, get tokenized into postings + doc-length
rows by the SAME ``doc_postings`` code path as the static build, and
append under their micro-batch's own ``batch_id`` partition (dynamic
partition overwrite — replay touches only itself).  Global statistics
(df, n_docs, avgdl) are NOT stored incrementally: they are algebraic
aggregates over the generational postings/doclens, derived
merge-on-read by ``bm25_topk_merged`` (operators/text_index.py) —
exactly the incremental-MV trade: per-batch writes stay O(batch),
probes pay a partial-agg over the (compactable) store.

``compact_text_index`` folds both stores through the shared two-phase
compactor; postings/doclens duplicates (possible only in the
crash-between-fold-and-delete window) would inflate df/tf/stats, so
the fold dedupes on the natural keys and a re-run always heals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text_index import doc_postings


def streaming_text_index_sink(index_path: str):
    """``foreachBatch`` callback: tokenize each micro-batch of
    ``(doc_id, text)`` rows and append their postings + doc lengths
    idempotently.  Compose with ``start_fanout`` (typically AFTER a
    dedup sink — index only what was admitted)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tf, dl = doc_postings(batch_df.select("doc_id", "text"))
        for rel, name in ((tf, "postings"), (dl, "doclens")):
            (
                rel.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{index_path}/{name}")
            )

    return process


def compact_text_index(
    spark: SparkSession, index_path: str, upto_batch_id: int
) -> int:
    """Fold both generational stores below the replay watermark (shared
    two-phase contract, :mod:`.compaction`).  Returns the total number
    of source partitions folded across the two stores."""
    from .compaction import compact_generations

    n = compact_generations(
        spark,
        f"{index_path}/postings",
        upto_batch_id,
        data_cols=["tok", "doc_id", "tf"],
        dedup_cols=["tok", "doc_id"],
    )
    n += compact_generations(
        spark,
        f"{index_path}/doclens",
        upto_batch_id,
        data_cols=["doc_id", "dl"],
        dedup_cols=["doc_id"],
    )
    return n
