"""Persisted multi-vector (MaxSim) chunk-bucket index.

The in-plan two-stage of operators/multivector.py computes chunk
buckets over the whole corpus at query time — correct, but the
bucketing pass costs a corpus scan, so pruning saves nothing
(measured: x10 pruned 2.64 s vs exact 2.11 s, PERF.md maxsim table).
This module makes stage 1 a STORED index, following the family pattern
of operators/ann_index.py / operators/text_index.py:

layout
    {index}/chunks   (vec_id, c, chunk, label) partitioned by
                     (batch_id, bucket) — bucket = the chunk's 8-bit
                     hyperplane-LSH bucket (16-dim hyperplanes, same
                     md5 construction the oracles replay)

serve (mv_probe_topk)
    stage 1: the 4-row broadcast query-bucket probe prunes the chunks
    scan on its ``bucket`` partition column — candidate doc ids come
    from matching-bucket partitions only, never a corpus scan;
    stage 2: candidates' FULL chunk sets (a vec_id join against the
    store — candidate-bounded) score exact MaxSim.

maintenance
    ingest_mv_vectors appends a batch into its own (batch_id, bucket)
    partitions — batch-id-keyed dynamic overwrite, so a replayed batch
    rewrites only itself (effectively-once, the repo-wide sink
    contract).  delete_mv_vectors physically removes every chunk row
    of the doomed ids from every generation (right-to-erasure beats
    time travel, the ann_ingest contract).

Result parity: a probe against the store is bit-identical to the
in-plan maxsim_pruned_topk — same buckets, same candidates, same
fixed-association MaxSim sum — so the registered persisted/ingest/
delete sims share the pruned oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_given_bnorm
from ..functions.vectors import norm2 as _norm2
from .ann_index import FROZEN_BATCH_ID
from .multivector import (
    CHUNK_DIM,
    NUM_CHUNKS,
    _maxsim_agg,
    chunk_array,
    doc_chunks,
    query_chunks,
)
from .similarity import lsh_bucket


def _chunk_rows(vectors: DataFrame) -> DataFrame:
    """(vec_id, label, c, chunk, bucket) rows — one per sub-vector."""
    return doc_chunks(vectors, keep=("vec_id", "label")).withColumn(
        "bucket", lsh_bucket(F.col("chunk"), CHUNK_DIM)
    )


def build_mv_index(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    corpus: DataFrame | None = None,
) -> None:
    """Write the chunk store's frozen generation.  ``corpus`` narrows
    which vectors are indexed at build time (ingest sims stream the
    rest in later); default: everything except query row 0."""
    if corpus is None:
        corpus = emb.where(F.col("vec_id") != 0)
    (
        _chunk_rows(corpus.select("vec_id", "embedding", "label"))
        .withColumn("batch_id", F.lit(FROZEN_BATCH_ID))
        .repartition("bucket")  # one file per (batch, bucket) partition
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "bucket")
        .parquet(f"{index_path}/chunks")
    )


def ingest_mv_vectors(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """Append one ingest generation — the batch's chunk rows land in
    their own (batch_id, bucket) partitions; dynamic overwrite makes a
    replay rewrite exactly itself."""
    (
        _chunk_rows(batch.select("vec_id", "embedding", "label"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .repartition("bucket")  # one file per (batch, bucket) partition
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "bucket")
        .parquet(f"{index_path}/chunks")
    )


def delete_mv_vectors(
    spark: SparkSession, index_path: str, vec_ids: list[int]
) -> int:
    """Right-to-erasure: physically drop every chunk row of the doomed
    vec_ids from every generation — the shared partition-local eraser
    (``streaming/compaction.erase_rows``), so only (batch_id, bucket)
    partitions actually containing a doomed row are rewritten, and a
    partition left empty is deleted outright.  Idempotent; run with
    the ingest stopped.  MaxSim carries no corpus statistics, so no
    correction bookkeeping is needed (the ann_ingest contract)."""
    from ..streaming.compaction import erase_rows

    return erase_rows(
        spark,
        f"{index_path}/chunks",
        "vec_id",
        [int(v) for v in vec_ids],
        extra_partition_cols=["bucket"],
    )


def mv_probe_topk(
    spark: SparkSession,
    index_path: str,
    query: DataFrame,
    k: int,
) -> DataFrame:
    """Two-stage MaxSim against the STORED chunk index.  Stage 1's
    chunks scan is pruned to the query's bucket partitions by the
    4-row broadcast probe; stage 2 re-reads only the candidates' chunk
    rows (vec_id join, candidate-bounded).  No bucketing of stored
    data happens at query time — the only lsh_bucket subtree in the
    plan is over the 4-row query side."""
    chunks = spark.read.parquet(f"{index_path}/chunks")
    qch = query_chunks(query)
    qb = qch.select(
        lsh_bucket(F.col("qchunk"), CHUNK_DIM).alias("qbucket")
    )
    cands = (
        chunks.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select("vec_id")
        .distinct()
    )
    # no broadcast hint on the candidate side: its size is a
    # data-dependent corpus fraction (AQE picks broadcast when small)
    cand_chunks = chunks.join(cands, "vec_id", "left_semi")
    pairs = cand_chunks.crossJoin(F.broadcast(qch)).select(
        "vec_id",
        "label",
        "qc",
        cosine_given_bnorm(
            F.col("chunk"), F.col("qchunk"), F.col("qn2")
        ).alias("pcos"),
    )
    return (
        _maxsim_agg(pairs)
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(k)
    )


def mv_batch_probe_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int,
    corpus_pred: F.Column | None = None,
) -> DataFrame:
    """Batch MaxSim serving: ONE stored-index scan answers the whole
    query batch (the production shape, mirroring ann_batch_topk /
    pq_batch_probe_topk).  ``queries`` carries (qid, qe); stage 1 is
    the same bucket partition pruning with a (batch x 4)-row broadcast
    probe, candidates are per-query (qid, vec_id) pairs, stage 2 joins
    candidates' chunk rows to THEIR query's chunks (qid-keyed
    broadcast) and ranks per query.  ``corpus_pred`` optionally
    narrows the stored corpus (e.g. excluding the query ids when they
    are themselves indexed)."""
    from pyspark.sql import Window

    chunks = spark.read.parquet(f"{index_path}/chunks")
    if corpus_pred is not None:
        chunks = chunks.where(corpus_pred)
    qch = queries.select(
        "qid",
        F.posexplode(chunk_array(F.col("qe"))).alias("qc", "qchunk"),
    ).withColumn("qn2", _norm2(F.col("qchunk")))
    qb = qch.select(
        "qid", lsh_bucket(F.col("qchunk"), CHUNK_DIM).alias("qbucket")
    )
    cands = (
        chunks.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select("qid", "vec_id")
        .distinct()
    )
    pairs = (
        chunks.join(cands, "vec_id")
        .join(F.broadcast(qch), "qid")
        .select(
            "qid",
            "vec_id",
            "label",
            "qc",
            cosine_given_bnorm(
                F.col("chunk"), F.col("qchunk"), F.col("qn2")
            ).alias("pcos"),
        )
    )
    best = pairs.groupBy("qid", "vec_id", "label").agg(
        *[
            F.max(F.when(F.col("qc") == c, F.col("pcos"))).alias(f"m{c}")
            for c in range(NUM_CHUNKS)
        ]
    )
    msum = ((F.col("m0") + F.col("m1")) + F.col("m2")) + F.col("m3")
    scored = best.select("qid", "vec_id", "label", msum.alias("maxsim"))
    w = Window.partitionBy("qid").orderBy(
        F.desc("maxsim"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def compact_mv_index(
    spark: SparkSession, index_path: str, upto_batch_id: int
) -> int:
    """Fold per-batch chunk partitions below ``upto_batch_id`` (plus
    previous frozen generations) into a new frozen generation and drop
    the sources — the shared two-phase contract
    (:mod:`..streaming.compaction`).  ``dedup_cols=(vec_id, c)`` for
    hygiene, though MaxSim itself is duplicate-insensitive (MAX over
    pair cosines and DISTINCT candidates both absorb repeats).  Run
    with the ingest stopped; returns source partitions folded."""
    from ..streaming.compaction import compact_generations

    return compact_generations(
        spark,
        f"{index_path}/chunks",
        int(upto_batch_id),
        data_cols=["vec_id", "c", "chunk", "label", "bucket"],
        dedup_cols=["vec_id", "c"],
        extra_partition_cols=["bucket"],
    )
