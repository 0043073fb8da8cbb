"""Generational count store for the n-gram LM family.

CCNet-style corpora refresh monthly: the reference slice grows by a
delta batch, and the LM must follow without a full refit.  n-gram
counts make that trivial IN PRINCIPLE — counts are associative, so
serving can sum per-batch deltas — and this store makes it a tested
CONTRACT: each batch writes its own delta partitions (batch-id-keyed
static overwrite, the repo's effectively-once replay discipline — a
crashed batch re-runs byte-identically because a delta depends only
on its own batch's documents), and serving merges ``batch_id <= g``.

Store layout under ``root``:

- ``bigrams/batch_id=N``  (lang, bg, c): the batch's own bigram
  counts — NOT merged totals, so replay needs no read-back;
- ``vocab/batch_id=N``    (lang, tok): tokens the batch contains
  (distinct within batch; serving re-distincts across batches, which
  is exactly the union of sets).

The incremental contract is EXACT, not add-only-approximate like the
graph store: merged counts equal a full refit by associativity, and
``lm_incremental_update_sim`` pins that equality by hash (a
divergence flips its refit_match column and fails the driver gate).

Scale shape: a delta batch's counts aggregate map-side before the
write; serving's merge is one vocabulary-sized ``groupBy(lang, bg)``
over the store scan, never a corpus pass.  At web scale the store is
bucketed by ``bg`` (the corpus_dedup bucketed-store pattern) so
serving co-locates without the shuffle — documented knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import bigram_counts, doc_tokens


def _write_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Static overwrite of one batch_id subdir (graph_ingest pattern:
    an empty delta still commits a schema-bearing zero-row file, so
    partition-discovery reads never break)."""
    df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def ingest_lm_batch(
    spark: SparkSession, root: str, docs: DataFrame, batch_id: int
) -> None:
    """Write one document batch's LM delta: per-language bigram
    counts and the batch's distinct token set."""
    _write_partition(
        bigram_counts(docs).withColumnRenamed("c_uw", "c"),
        f"{root}/bigrams",
        batch_id,
    )
    _write_partition(
        doc_tokens(docs)
        .select("lang", F.explode(F.col("toks")).alias("tok"))
        .distinct(),
        f"{root}/vocab",
        batch_id,
    )


def serve_bigram_counts(
    spark: SparkSession, root: str, gen: int
) -> DataFrame:
    """Merged (lang, bg, c_uw) as-of generation ``gen`` — the exact
    counts a full refit over the same batches would produce."""
    return (
        spark.read.parquet(f"{root}/bigrams")
        .where(F.col("batch_id") <= gen)
        .groupBy("lang", "bg")
        .agg(F.sum("c").cast("bigint").alias("c_uw"))
    )


def serve_vocab_sizes(
    spark: SparkSession, root: str, gen: int
) -> DataFrame:
    """Merged per-language vocabulary size as-of ``gen`` (distinct of
    the per-batch distinct sets = distinct of the union)."""
    return (
        spark.read.parquet(f"{root}/vocab")
        .where(F.col("batch_id") <= gen)
        .select("lang", "tok")
        .distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_v"))
    )
