"""Multi-vector late-interaction retrieval (ColBERT-style MaxSim).

North-star surface beyond single-vector ANN: each document is
represented by several sub-vectors (here: the 64-dim embedding split
into 4 contiguous 16-dim chunks — a deterministic stand-in for
per-token/per-chunk encoder output), and relevance is the late
interaction score

    MaxSim(q, d) = sum over query chunks c of
                   max over doc chunks m of cos(q_c, d_m)

(Khattab & Zaharia, ColBERT, SIGIR 2020).  The reference engine has no
multi-vector surface (its whole pipeline is JSON CDC rows,
/root/reference/pipeline/app.py); this family is part of the
LLM-training-data north star: late-interaction retrieval is the
standard quality/cost point between single-vector ANN and full
cross-encoder rerank.

Scale design (100 TB): the exact operator scores |corpus| x M x M chunk
pairs per query — the correctness baseline, never the serve path.  The
serve path is the standard ColBERT two-stage: (1) per-chunk ANN — every
chunk carries an 8-bit hyperplane-LSH bucket (the SAME md5-derived
hyperplanes as operators/similarity.py, length 16), and a doc becomes a
candidate when ANY of its chunk buckets equals ANY query-chunk bucket —
a bucket-local equi-join, never a corpus scan; (2) exact MaxSim rerank
over the candidate set only.  Candidates are df-bounded by construction
(buckets partition the corpus ~uniformly under random hyperplanes), and
the recall/scan-fraction trade is itself a registered, hash-checked
query (maxsim_recall_report).

Determinism: chunk cosines go through functions/vectors.py quantized
integer math (bit-identical in DuckDB); per-query-chunk maxima are
exact selections over identical doubles; the final MaxSim sum is a
FIXED 4-term left-associated addition written identically in both
engines — never a SUM() over a group, whose accumulation order an
engine is free to choose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_given_bnorm, norm2
from .similarity import lsh_bucket

NUM_CHUNKS = 4
CHUNK_DIM = 16


def chunk_array(emb_col: F.Column) -> F.Column:
    """array of NUM_CHUNKS contiguous CHUNK_DIM slices of the embedding."""
    return F.array(
        *[
            F.slice(emb_col, c * CHUNK_DIM + 1, CHUNK_DIM)
            for c in range(NUM_CHUNKS)
        ]
    )


def doc_chunks(
    df: DataFrame, emb_col: str = "embedding", keep: tuple[str, ...] = ("vec_id",)
) -> DataFrame:
    """Explode each row into (keep..., c, chunk) — one row per
    sub-vector.  Narrow, shuffle-free projection."""
    return df.select(
        *[F.col(k) for k in keep],
        F.posexplode(chunk_array(F.col(emb_col))).alias("c", "chunk"),
    )


def query_chunks(query: DataFrame, emb_col: str = "qe") -> DataFrame:
    """Query-side chunks with precomputed squared norms (broadcast
    side: NUM_CHUNKS rows).  Columns: qc, qchunk, qn2."""
    return (
        query.select(
            F.posexplode(chunk_array(F.col(emb_col))).alias("qc", "qchunk")
        )
        .withColumn("qn2", norm2(F.col("qchunk")))
    )


def _maxsim_agg(pairs: DataFrame) -> DataFrame:
    """(vec_id, label, qc, pcos) pairs -> one row per doc with the
    fixed-order MaxSim sum.  The per-chunk maxima land in fixed columns
    so the 4-term addition has ONE associativity order on both engines."""
    best = pairs.groupBy("vec_id", "label").agg(
        *[
            F.max(F.when(F.col("qc") == c, F.col("pcos"))).alias(f"m{c}")
            for c in range(NUM_CHUNKS)
        ]
    )
    msum = (
        (F.col("m0") + F.col("m1")) + F.col("m2")
    ) + F.col("m3")
    return best.select("vec_id", "label", msum.alias("maxsim"))


def maxsim_score(corpus: DataFrame, query: DataFrame) -> DataFrame:
    """Exact MaxSim of every corpus doc against the (single-row)
    query.  Corpus scan stays partition-parallel; the query side is
    NUM_CHUNKS broadcast rows; per-doc work is M x M fused chunk
    cosines."""
    dch = doc_chunks(corpus, keep=("vec_id", "label"))
    qch = query_chunks(query)
    pairs = dch.crossJoin(F.broadcast(qch)).select(
        "vec_id",
        "label",
        "qc",
        cosine_given_bnorm(
            F.col("chunk"), F.col("qchunk"), F.col("qn2")
        ).alias("pcos"),
    )
    return _maxsim_agg(pairs)


def maxsim_topk(corpus: DataFrame, query: DataFrame, k: int) -> DataFrame:
    """Exact late-interaction top-k (TakeOrderedAndProject — no global
    sort)."""
    return (
        maxsim_score(corpus, query)
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(k)
    )


def chunk_candidates(corpus: DataFrame, query: DataFrame) -> DataFrame:
    """Stage-1 candidate docs: ANY doc chunk in the LSH bucket of ANY
    query chunk (16-dim hyperplanes, same md5 construction as the
    single-vector family).  Bucket-local equi-join against a
    NUM_CHUNKS-row broadcast — the corpus is touched once to bucket its
    chunks; at scale the buckets are the stored index."""
    dch = doc_chunks(corpus).select(
        "vec_id", lsh_bucket(F.col("chunk"), CHUNK_DIM).alias("bucket")
    )
    qb = query_chunks(query).select(
        lsh_bucket(F.col("qchunk"), CHUNK_DIM).alias("qbucket")
    )
    return (
        dch.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select("vec_id")
        .distinct()
    )


def maxsim_pruned_topk(
    corpus: DataFrame, query: DataFrame, k: int
) -> DataFrame:
    """Two-stage ColBERT serve path: chunk-LSH candidates, exact MaxSim
    rerank on candidates only."""
    cands = chunk_candidates(corpus, query)
    pruned = corpus.join(cands, "vec_id")
    return maxsim_topk(pruned, query, k)
