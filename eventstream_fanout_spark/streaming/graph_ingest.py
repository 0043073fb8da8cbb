"""Incremental PageRank maintenance over a generational rank store.

``domain_pagerank`` (plans/graph_queries.py) derives the co-citation
graph and ranks from the WHOLE corpus — correct, but a 100 TB crawl
cannot re-derive its edge set per refresh (PERF.md: the full
derivation is linear in the corpus, 1825 s at x1000).  This module
adds the maintenance contract (round-12 verdict item 6): each ingested
document batch refreshes the graph stores incrementally, and the rank
iterations re-run over the MERGED |sources|^2-bounded aggregates — the
corpus-sized pair derivation is touched only for the shingles the
delta actually changed.

Store layout (all batch-id-keyed dynamic partition overwrites — the
repo's effectively-once replay contract):

- ``postings/``  (batch_id, g, source, doc_id): the delta batch's
  distinct shingle postings, append-only by batch;
- ``nodes/``     (batch_id, source): sources first seen per batch;
- ``edges/``     (batch_id, src, dst): the NEW co-citation pairs the
  batch created — pairs of every shingle the batch TOUCHED whose
  merged document frequency is now inside [DF_MIN, DF_MAX];
- ``ranks/``     (gen, source, rank_micro, out_deg, in_deg): one
  PageRank generation per ingested batch, computed over the DISTINCT
  union of all edge partitions as-of that batch.

Documented incremental contract (the production compromise, stated
rather than hidden): edges are ADD-ONLY between full rebuilds.  A
shingle whose df later leaves the [DF_MIN, DF_MAX] band keeps the
pairs it already contributed until the next full rebuild (refit), so
staleness is bounded by rebuild cadence — the same freshness posture
as the ANN index's drift->refit loop (ann_index_refit_sim).  The
DuckDB oracle replays exactly this contract, so the sim's hashes pin
the add-only semantics, not an approximation of the exact graph.

Replay determinism WITHOUT markers: every refresh reads its inputs
``WHERE batch_id <= b`` — the as-of discipline — so re-running batch
b's refresh after later batches landed rewrites byte-identical
partitions (postings/nodes/edges/ranks for b never see b+1 data).

Scale shape: the delta's touched-shingle set joins back against the
postings store on ``g``; a rare shingle's posting list is <= DF_MAX
rows, so the pair join is delta-bounded.  The postings scan itself
rides Spark's runtime bloom-filter pruning on ``g`` (pinned by
test_runtime_bloom_filter_join_pruning); at web scale the store is
bucketed by ``g`` (the streaming/corpus_dedup.py bucketed-store
pattern) so the lookup co-locates without a scan — documented knob,
same trade as the model store's vocabulary bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import shingles, tokens
from ..operators.graph import (
    DF_MAX,
    DF_MIN,
    N_ITER,
    SHINGLE_N,
    pagerank_integer,
)


def _batch_postings(docs: DataFrame) -> DataFrame:
    """Distinct (g, source, doc_id) shingle postings of one batch."""
    return docs.select(
        "doc_id",
        "source",
        F.explode(shingles(tokens(F.col("text")), SHINGLE_N)).alias("g"),
    ).distinct()


def _write_partition(df: DataFrame, path: str, batch_id: int,
                     key: str = "batch_id") -> None:
    (
        df.withColumn(key, F.lit(batch_id).cast("int"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(key)
        .parquet(path)
    )


def ingest_graph_batch(
    spark: SparkSession,
    store: str,
    docs_batch: DataFrame,
    batch_id: int,
    n_iter: int = N_ITER,
) -> None:
    """Land one document batch and refresh edges + ranks as-of it.

    Idempotent per batch_id: all reads are ``batch_id <= b`` and all
    writes are partition overwrites keyed by this batch, so a replay
    (even after later batches committed) rewrites identical bytes.
    """
    sh_b = _batch_postings(docs_batch).localCheckpoint(eager=True)
    _write_partition(sh_b, f"{store}/postings", batch_id)
    _write_partition(
        docs_batch.select("source").distinct(), f"{store}/nodes", batch_id
    )

    # --- delta edge derivation: only shingles this batch touched ---
    touched = sh_b.select("g").distinct()
    postings_asof = spark.read.parquet(f"{store}/postings").where(
        F.col("batch_id") <= batch_id
    )
    plist = postings_asof.join(touched, "g").select(
        "g", "source", "doc_id"
    ).distinct()
    rare_now = (
        plist.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df").between(DF_MIN, DF_MAX))
        .select("g")
    )
    bounded = plist.join(rare_now, "g")
    a = bounded.select("g", F.col("source").alias("src"))
    b = bounded.select("g", F.col("source").alias("dst"))
    pairs = (
        a.join(b, "g")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    _write_partition(pairs, f"{store}/edges", batch_id)

    # --- rank refresh: iterations over merged aggregates only ---
    nodes_asof = (
        spark.read.parquet(f"{store}/nodes")
        .where(F.col("batch_id") <= batch_id)
        .select("source")
        .distinct()
    )
    edges_asof = (
        spark.read.parquet(f"{store}/edges")
        .where(F.col("batch_id") <= batch_id)
        .select("src", "dst")
        .distinct()
    )
    _write_partition(
        pagerank_integer(nodes_asof, edges_asof, n_iter),
        f"{store}/ranks",
        batch_id,
        key="gen",
    )


def read_rank_generations(spark: SparkSession, store: str) -> DataFrame:
    """All persisted rank generations:
    (gen, source, rank_micro, out_deg, in_deg)."""
    return spark.read.parquet(f"{store}/ranks").select(
        F.col("gen").cast("int").alias("gen"),
        "source",
        "rank_micro",
        "out_deg",
        "in_deg",
    )
