"""Curated ingest — the composed training-data pipeline stage:
dedup-then-index inside one ``foreachBatch``.

The reference's "coordinated fan-out" (reference pipeline/app.py:55-109)
writes the SAME rows to every sink; a training-data ingest needs the
sinks to be STAGED — only documents that survive incremental dedup
(streaming/corpus_dedup.py) may enter the retrieval index
(streaming/text_ingest.py).  This callback chains them:

1. the dedup sink admits the batch's near-dup-free docs and writes
   them under ``out_path/batch_id=N`` (its existing idempotent
   contract);
2. the ADMITTED partition is read back — exactly this batch's
   survivors, no recompute, no driver round-trip — and fed to the
   text-index sink, which appends postings/doclens under the same
   batch id.

Crash anywhere between the three writes heals on replay: every write
is keyed by the batch's own partition and overwrites only itself, so
re-running the batch converges (the corpus_dedup crash-between-writes
analysis extends unchanged — the index can never contain a doc the
dedup output lost, because it is BUILT from the dedup output).
"""

from __future__ import annotations

from .corpus_dedup import _read_store_or_none, streaming_dedup_sink
from .text_ingest import streaming_text_index_sink


def curated_ingest_sink(
    store_path: str,
    out_path: str,
    index_path: str,
    min_jaccard: float | None = None,
):
    """``foreachBatch`` callback: dedup the batch against the
    persistent signature store, then index exactly the admitted docs.
    ``min_jaccard`` selects verified dedup mode as on
    :func:`streaming_dedup_sink`."""
    dedup = streaming_dedup_sink(store_path, out_path, min_jaccard)
    index = streaming_text_index_sink(index_path)

    def process(batch_df, batch_id: int) -> None:
        dedup(batch_df, batch_id)
        admitted = _read_store_or_none(
            batch_df.sparkSession,
            f"{out_path}/batch_id={int(batch_id)}",
            exclude_batch_id=None,
        )
        if admitted is None:  # empty batch or everything rejected
            return
        index(admitted.select("doc_id", "text"), batch_id)

    return process
