"""Source-graph construction + integer PageRank for crawl curation.

A 100 TB web-scale corpus needs per-domain authority signals to weight
sampling and filtering (the "domain ranking" stage of an LLM data
pipeline).  This module derives a directed source→source graph from
rare shared shingles ("co-citation": two sources whose documents share
an uncommon 5-gram are linked) and ranks sources with a fixed-iteration
PageRank computed **entirely in integers** so a SQL oracle reproduces
it bit-for-bit:

- ranks live in micro-units (BIGINT, ``RANK_SCALE`` = 1e6 total mass);
- each contribution is ``floor(0.85 * r / out_deg)`` where the divide
  is one correctly-rounded IEEE op on exact integers (r <= 1e6, so
  ``0.85 * r`` <= 8.5e5 is exact in double) — the floor is therefore
  engine-independent, and BIGINT sums are order-independent;
- the teleport term is ``floor(0.15 * RANK_SCALE / n_nodes)``.

Float PageRank would diverge across engines in the last ulp after a
few iterations; quantizing every step makes the fixpoint math exact at
the cost of dropping sub-micro rank mass (documented variant —
dangling-node mass is likewise dropped, not redistributed).

Scale design: the expensive stage is the shingle self-join, which is
df-bounded exactly like the MinHash-LSH candidate join (shingles with
document-frequency outside [2, DF_MAX] are discarded, so no hot
shingle can quadratically blow up the pair count).  The resulting
edge/degree tables are |sources|^2-bounded — tiny next to the corpus —
and the five rank iterations run over those aggregates only
(localCheckpoint'd once, same pattern as dup_clusters' label
propagation in plans/pipeline_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles, tokens

SHINGLE_N = 5
DF_MIN, DF_MAX = 2, 6
RANK_SCALE = 1_000_000.0
DAMPING_NUM = 0.85  # exact in the expressions below (0.85 * r <= 8.5e5)
TELEPORT_NUM = 0.15
N_ITER = 5


def cocitation_edges(docs: DataFrame) -> DataFrame:
    """Directed (src, dst) edges between sources sharing a rare shingle.

    df-bounded: only shingles appearing in DF_MIN..DF_MAX distinct
    documents participate in the self-join, so the candidate pair
    count per shingle is <= DF_MAX^2 regardless of corpus size (the
    same skew guard as the LSH band join in operators/dedup.py).
    """
    # tokens materialized as a column first (doc_shingles discipline):
    # inlining the split into the shingle lambda re-splits the text on
    # every element_at — O(tokens²) per document
    toked = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    )
    sh = toked.select(
        "doc_id",
        "source",
        F.explode(shingles(F.col("toks"), SHINGLE_N)).alias("g"),
    ).distinct()
    rare = (
        sh.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df").between(DF_MIN, DF_MAX))
        .select("g")
    )
    bounded = sh.join(rare, "g")
    a = bounded.select("g", F.col("source").alias("src"))
    b = bounded.select("g", F.col("source").alias("dst"))
    return (
        a.join(b, "g")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank_integer(
    nodes: DataFrame, edges: DataFrame, n_iter: int = N_ITER
) -> DataFrame:
    """Fixed-iteration integer PageRank.

    ``nodes``: one column ``source``; ``edges``: (src, dst) directed,
    distinct.  Returns (source, rank_micro, out_deg, in_deg) with
    rank_micro the BIGINT micro-unit rank after ``n_iter`` steps.

    The aggregated inputs are node/edge-sized, so the iterations are
    cheap; they are localCheckpoint'd once so the (potentially huge)
    edge-derivation lineage is not replayed per step.
    """
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    out_deg = edges.groupBy(F.col("src").alias("source")).agg(
        F.count("*").alias("out_deg")
    )
    in_deg = edges.groupBy(F.col("dst").alias("source")).agg(
        F.count("*").alias("in_deg")
    )
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    base = F.floor(
        F.lit(TELEPORT_NUM) * F.lit(RANK_SCALE) / F.col("n_nodes")
    ).cast("long")
    init = F.floor(F.lit(RANK_SCALE) / F.col("n_nodes")).cast("long")

    rank = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "source", init.alias("r")
    )
    degreed = edges.join(
        out_deg.select(F.col("source").alias("src"), "out_deg"), "src"
    )
    for _ in range(n_iter):
        contrib = (
            rank.join(degreed, rank["source"] == degreed["src"])
            .select(
                F.col("dst").alias("source"),
                F.floor(
                    F.lit(DAMPING_NUM)
                    * F.col("r")
                    / F.col("out_deg")
                )
                .cast("long")
                .alias("c"),
            )
            .groupBy("source")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = (
            nodes.join(contrib, "source", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "source",
                (
                    base
                    + F.coalesce(F.col("contrib"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        )
    return (
        rank.join(out_deg, "source", "left")
        .join(in_deg, "source", "left")
        .select(
            "source",
            F.col("r").alias("rank_micro"),
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )
