"""Incremental inverted-index ingestion — the generational-store
pattern (corpus_dedup / ann_ingest) applied to text retrieval.

New documents stream in, get tokenized into dl-carrying postings +
doc-length rows by the SAME ``doc_postings`` code path as the static
build, and append under their micro-batch's own ``batch_id`` partition
(dynamic partition overwrite — replay touches only itself).  Per-term
document frequency is NOT stored incrementally: it is an algebraic
aggregate over the generational postings, derived merge-on-read by
``bm25_topk_merged`` (operators/text_index.py) from the term-filtered
scan the probe already pays for.  The corpus rollup (n_docs, avgdl)
IS stored — as one tiny ``stats`` row per generation (round-7 change:
probes sum #generations rows instead of scanning per-doc lengths),
written LAST so the sink's crash window always manifests as
postings-without-stats, which the probe detects and a replay heals;
the opposite order would leave ghost stats rows counting documents
whose postings never landed — silent and undetectable.

``doc_id`` uniqueness across generations is a CONTRACT of this store
(a doc present in two generations double-counts its length in the
rollup and duplicates its scoring rows): the sink enforces it at
write time with one anti-join of the batch's ids against the stored
doclens (per-batch cost, one doclens scan per INGEST batch — probes,
the frequent path, pay nothing; the corpus_dedup-staged pipeline
makes this check a no-op in practice but a reused doc_id under NEW
text would pass content dedup and corrupt the index, hence the
explicit gate).  ``enforce_unique_doc_ids=False`` opts out for
callers that already guarantee it upstream.

``compact_text_index`` folds both generational stores through the
shared two-phase compactor — postings/doclens duplicates (possible
only in the crash-between-fold-and-delete window) would inflate
df/tf/stats, so the fold dedupes on the natural keys and a re-run
always heals — then rebuilds the ``stats`` table from the folded
doclens (the authoritative per-doc lengths), so a healed store's
rollup is exact again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text_index import batch_stats, doc_postings


def streaming_text_index_sink(
    index_path: str, enforce_unique_doc_ids: bool = True
):
    """``foreachBatch`` callback: tokenize each micro-batch of
    ``(doc_id, text)`` rows and append their postings + doc lengths +
    stats row idempotently.  Compose with ``start_fanout`` (typically
    AFTER a dedup sink — index only what was admitted)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if enforce_unique_doc_ids:
            _check_new_doc_ids(spark, index_path, batch_df, int(batch_id))
        postings, dl = doc_postings(batch_df.select("doc_id", "text"))
        for rel, name in (
            (postings, "postings"),
            (dl, "doclens"),
            (batch_stats(dl), "stats"),  # stats LAST — see module doc
        ):
            (
                rel.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{index_path}/{name}")
            )

    return process


def _check_new_doc_ids(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """Raise if any of the batch's doc_ids already exist in another
    generation of the store (the batch's OWN partition is masked so
    replay cannot reject itself)."""
    from pyspark.errors import AnalysisException

    try:
        stored = spark.read.parquet(f"{index_path}/doclens")
    except AnalysisException:
        return  # no store yet — the batch founds it
    clashes = (
        batch_df.select("doc_id")
        .distinct()
        .join(
            stored.where(F.col("batch_id") != batch_id).select("doc_id"),
            "doc_id",
        )
        .limit(5)
        .collect()
    )
    if clashes:
        ids = sorted(r["doc_id"] for r in clashes)
        raise RuntimeError(
            f"text index ingest: batch {batch_id} re-sends doc_id(s) "
            f"{ids} already indexed under another generation — doc_id "
            "uniqueness is a contract of this store (duplicates corrupt "
            "df/stats and double score rows); route updates through a "
            "delete+compact cycle instead"
        )


def _rebuild_stats(spark: SparkSession, index_path: str) -> None:
    """Recompute the per-generation stats rollup from the authoritative
    doclens (tiny relation; full overwrite is safe — a crash mid-write
    leaves an unreadable stats table and probes fail closed on read;
    re-running heals)."""
    dl = spark.read.parquet(f"{index_path}/doclens")
    (
        dl.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("total_len"),
        )
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(f"{index_path}/stats")
    )


def delete_docs(
    spark: SparkSession, index_path: str, doc_ids: list[int]
) -> int:
    """Erase documents from the index — the maintenance op the ingest
    sink's doc_id-uniqueness error message points to (delete + re-send
    is the update path of this append-only store), and the
    right-to-erasure primitive a training-data pipeline owes its
    sources.  Returns the number of generations rewritten.

    Mechanics: only the generations that actually CONTAIN a doomed doc
    are rewritten (their surviving rows dynamic-overwrite the
    partition; a partition left EMPTY is deleted outright — dynamic
    overwrite cannot express "replace with nothing"), then the
    vocab snapshot and the stats rollup are rebuilt from the surviving
    rows, so BOTH probes (static snapshot and merge-on-read) are
    consistent immediately.  Idempotent: re-running with the same ids
    rewrites nothing.  Run with the ingest stream stopped (the
    compaction contract).

    Scale note: ``doc_ids`` is a driver-side list (an erasure request
    is metadata-sized by nature); the rewrite cost is proportional to
    the TOUCHED generations' size, not the store — compact first if
    erasures should touch one folded generation instead of many."""
    from .compaction import erase_rows

    ids = [int(d) for d in doc_ids]
    rewritten = 0
    for name in ("postings", "doclens"):
        rewritten += erase_rows(
            spark, f"{index_path}/{name}", "doc_id", ids
        )
    if rewritten:
        _rebuild_stats(spark, index_path)
        postings = spark.read.parquet(f"{index_path}/postings")
        postings.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("df")
        ).write.mode("overwrite").parquet(f"{index_path}/vocab")
    return rewritten


def compact_text_index(
    spark: SparkSession, index_path: str, upto_batch_id: int
) -> int:
    """Fold both generational stores below the replay watermark (shared
    two-phase contract, :mod:`.compaction`), then rebuild the stats
    table from the folded doclens.  Returns the total number of source
    partitions folded across the two stores."""
    from .compaction import compact_generations

    n = compact_generations(
        spark,
        f"{index_path}/postings",
        upto_batch_id,
        data_cols=["tok", "doc_id", "tf", "dl"],
        dedup_cols=["tok", "doc_id"],
    )
    n += compact_generations(
        spark,
        f"{index_path}/doclens",
        upto_batch_id,
        data_cols=["doc_id", "dl"],
        dedup_cols=["doc_id"],
    )
    # stats rebuild: one row per surviving doclens generation (heals
    # any rollup drift a crashed sink or fold left behind)
    _rebuild_stats(spark, index_path)
    return n
