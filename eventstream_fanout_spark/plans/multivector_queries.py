"""Second-generation retrieval queries: multi-vector late interaction
(ColBERT-style MaxSim) and Matryoshka prefix-dimension ANN, with DuckDB
oracles.

Both families are north-star additions (the reference engine has no
vector surface at all — /root/reference/pipeline/app.py processes JSON
CDC rows only): late interaction is the standard quality/cost point
between single-vector ANN and cross-encoder rerank, and prefix-dim
(Matryoshka, Kusupati et al. 2022) coarse search is the standard
bandwidth dial when embeddings are trained nested.

Determinism: all chunk/prefix cosines ride functions/vectors.py
quantized integer sums; MaxSim's 4-term sum is a fixed-association
addition over fixed columns (never SUM() over a group of doubles);
candidate cutoffs use rank-with-vec_id tie-break so both engines pick
identical sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import QV, cosine_given_bnorm, norm2
from ..operators.multivector import (
    CHUNK_DIM,
    NUM_CHUNKS,
    chunk_candidates,
    maxsim_pruned_topk,
    maxsim_topk,
)
from ..operators.similarity import (
    NUM_HYPERPLANES,
    brute_force_topk,
    hyperplane_signs,
)
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------- maxsim

_CHUNK_BASE = f"""
  flat AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
  ),
  chunkflat AS (
    SELECT vec_id, CAST((i - 1) // {CHUNK_DIM} AS INTEGER) AS c,
           ((i - 1) % {CHUNK_DIM}) + 1 AS j, x
    FROM flat
  ),
  cnorms AS (
    SELECT vec_id, c,
           CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS n2
    FROM chunkflat GROUP BY vec_id, c
  )"""

_BEST_MAXES = ",\n           ".join(
    f"MAX(CASE WHEN qc = {c} THEN pcos END) AS m{c}"
    for c in range(NUM_CHUNKS)
)

# pair -> per-(doc, query-chunk) max cosine -> fixed-order 4-term sum.
# ``cand_filter`` narrows the doc side (stage-2 rerank); '' = exact.
def _maxsim_core(cand_filter: str = "") -> str:
    return f"""
  qcf AS (SELECT c AS qc, j, x FROM chunkflat WHERE vec_id = 0),
  pair AS (
    SELECT d.vec_id, d.c AS dc, q.qc,
           CAST(SUM(CAST(FLOOR(d.x * q.x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS dot
    FROM chunkflat d JOIN qcf q ON d.j = q.j
    WHERE d.vec_id <> 0 {cand_filter}
    GROUP BY 1, 2, 3
  ),
  pcosr AS (
    SELECT p.vec_id, p.qc,
           (p.dot / (sqrt(dn.n2) * sqrt(qn.n2))) AS pcos
    FROM pair p
    JOIN cnorms dn ON dn.vec_id = p.vec_id AND dn.c = p.dc
    JOIN cnorms qn ON qn.vec_id = 0 AND qn.c = p.qc
  ),
  best AS (
    SELECT vec_id,
           {_BEST_MAXES}
    FROM pcosr GROUP BY vec_id
  ),
  scored AS (
    SELECT vec_id, (((m0 + m1) + m2) + m3) AS maxsim FROM best
  )"""


_SIGNS16_VALUES = ", ".join(
    f"({j}, {i + 1}, {s})"
    for j in range(NUM_HYPERPLANES)
    for i, s in enumerate(hyperplane_signs(j, CHUNK_DIM))
)

# chunk-level LSH buckets + candidate set (docs sharing ANY chunk
# bucket with ANY query chunk) — replays operators/multivector.py's
# chunk_candidates with the same md5-derived 16-dim hyperplanes.
_CHUNK_CANDS = f"""
  signs16(p, j, s) AS (SELECT * FROM (VALUES {_SIGNS16_VALUES})),
  quantc AS (
    SELECT vec_id, c, j, CAST(FLOOR(x * {1e9!r} + 0.5) AS BIGINT) AS xq
    FROM chunkflat
  ),
  cprojs AS (
    SELECT q.vec_id, q.c, s.p, SUM(q.xq * s.s) AS proj
    FROM quantc q JOIN signs16 s ON q.j = s.j
    GROUP BY 1, 2, 3
  ),
  cbuckets AS (
    SELECT vec_id, c,
           CAST(SUM(CASE WHEN proj > 0 THEN CAST(POW(2, p) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS bucket
    FROM cprojs GROUP BY vec_id, c
  ),
  qcb AS (SELECT bucket AS qbucket FROM cbuckets WHERE vec_id = 0),
  cands AS (
    SELECT DISTINCT b.vec_id
    FROM cbuckets b JOIN qcb ON b.bucket = qcb.qbucket
    WHERE b.vec_id <> 0
  )"""


@register(
    "maxsim_multivector_topk",
    f"""
    WITH {_CHUNK_BASE},
    {_maxsim_core()}
    SELECT s.vec_id, e.label, s.maxsim
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.maxsim DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="exact ColBERT-style late-interaction top-10: each doc "
    "= 4 contiguous 16-dim chunks of its embedding, score = sum over "
    "query chunks of max chunk cosine; fixed-association 4-term sum "
    "keeps the double bit-identical cross-engine. The correctness "
    "baseline of the multi-vector family (the serve path is the pruned "
    "variant)",
    tags=("similarity", "multivector", "maxsim", "extension"),
)
def maxsim_multivector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    return maxsim_topk(corpus, query, 10)


@register(
    "maxsim_pruned_topk",
    f"""
    WITH {_CHUNK_BASE},
    {_CHUNK_CANDS},
    {_maxsim_core("AND d.vec_id IN (SELECT vec_id FROM cands)")}
    SELECT s.vec_id, e.label, s.maxsim
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.maxsim DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="two-stage ColBERT serve path: stage 1 = per-chunk "
    "8-bit hyperplane-LSH candidate generation (doc is a candidate iff "
    "ANY chunk bucket equals ANY query-chunk bucket — bucket-local "
    "equi-join, never a corpus scan), stage 2 = exact MaxSim rerank on "
    "candidates only. At 100 TB stage 1 reads a stored chunk-bucket "
    "index; stage 2 cost is candidate-bounded",
    tags=("similarity", "multivector", "maxsim", "lsh", "extension"),
)
def maxsim_pruned_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    return maxsim_pruned_topk(corpus, query, 10)


@register(
    "maxsim_recall_report",
    f"""
    WITH {_CHUNK_BASE},
    {_CHUNK_CANDS},
    {_maxsim_core()}
    , exact10 AS (
      SELECT vec_id FROM scored ORDER BY maxsim DESC, vec_id ASC LIMIT 10
    ),
    pruned10 AS (
      SELECT vec_id FROM scored
      WHERE vec_id IN (SELECT vec_id FROM cands)
      ORDER BY maxsim DESC, vec_id ASC LIMIT 10
    ),
    hits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM pruned10 p JOIN exact10 x ON p.vec_id = x.vec_id
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cands),
    ncorp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT 'chunk_lsh' AS method, 10 AS k, hits.n_hits,
           (CAST(hits.n_hits AS DOUBLE) / 10.0) AS recall_at_10,
           nc.n_candidates, ncorp.n_corpus,
           (CAST(nc.n_candidates AS DOUBLE)
              / CAST(ncorp.n_corpus AS DOUBLE)) AS scan_fraction
    FROM hits, nc, ncorp
    """,
    description="recall@10 of the chunk-LSH-pruned MaxSim against the "
    "exact late-interaction top-10, with the candidate scan fraction — "
    "the multi-vector family's quality-vs-scan dial as a hash-checked "
    "row (same sandwich discipline as ann_recall_report)",
    tags=("similarity", "multivector", "maxsim", "recall", "extension"),
)
def maxsim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    exact = maxsim_topk(corpus, query, 10).select("vec_id")
    pruned = maxsim_pruned_topk(corpus, query, 10).select("vec_id")
    hits = pruned.join(exact, "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    nc = chunk_candidates(corpus, query).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    ncorp = corpus.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    return (
        hits.crossJoin(nc)
        .crossJoin(ncorp)
        .select(
            F.lit("chunk_lsh").alias("method"),
            F.lit(10).cast("int").alias("k"),
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(10.0)).alias(
                "recall_at_10"
            ),
            "n_candidates",
            "n_corpus",
            (
                F.col("n_candidates").cast("double")
                / F.col("n_corpus").cast("double")
            ).alias("scan_fraction"),
        )
    )


# ------------------------------------------------------------ matryoshka

PREFIX_DIM = 16
MATRYOSHKA_CANDIDATES = 50

_PREFIX_BASE = f"""
  flat AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
  ),
  norms AS (
    SELECT vec_id,
           CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS n2
    FROM flat GROUP BY vec_id
  ),
  pnorms AS (
    SELECT vec_id,
           CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS n2
    FROM flat WHERE i <= {PREFIX_DIM} GROUP BY vec_id
  ),
  qpf AS (SELECT i, x FROM flat WHERE vec_id = 0 AND i <= {PREFIX_DIM}),
  psums AS (
    SELECT cf.vec_id,
           CAST(SUM(CAST(FLOOR(cf.x * qpf.x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS dot
    FROM flat cf JOIN qpf ON cf.i = qpf.i
    WHERE cf.vec_id <> 0 AND cf.i <= {PREFIX_DIM}
    GROUP BY cf.vec_id
  ),
  pcosrel AS (
    SELECT s.vec_id,
           (s.dot / (sqrt(pa.n2) * sqrt(pq.n2))) AS cosine_prefix
    FROM psums s
    JOIN pnorms pa ON pa.vec_id = s.vec_id
    JOIN pnorms pq ON pq.vec_id = 0
  ),
  prank AS (
    SELECT vec_id, cosine_prefix,
           ROW_NUMBER() OVER (ORDER BY cosine_prefix DESC, vec_id ASC)
             AS r
    FROM pcosrel
  ),
  mcands AS (
    SELECT vec_id, cosine_prefix FROM prank
    WHERE r <= {MATRYOSHKA_CANDIDATES}
  )"""

_FULL_RERANK = f"""
  qf AS (SELECT i, x FROM flat WHERE vec_id = 0),
  fsums AS (
    SELECT cf.vec_id,
           CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                AS DOUBLE) / {QV!r} AS dot
    FROM flat cf JOIN qf ON cf.i = qf.i
    WHERE cf.vec_id IN (SELECT vec_id FROM mcands)
    GROUP BY cf.vec_id
  ),
  reranked AS (
    SELECT s.vec_id,
           (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) AS cosine
    FROM fsums s
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = 0
  )"""


@register(
    "ann_matryoshka_topk",
    f"""
    WITH {_PREFIX_BASE},
    {_FULL_RERANK}
    SELECT r.vec_id, e.label, r.cosine, m.cosine_prefix
    FROM reranked r
    JOIN mcands m ON m.vec_id = r.vec_id
    JOIN embeddings e ON e.vec_id = r.vec_id
    ORDER BY r.cosine DESC, r.vec_id ASC
    LIMIT 10
    """,
    description="Matryoshka prefix-dimension ANN: coarse cosine over "
    f"the first {PREFIX_DIM} of 64 dims picks {MATRYOSHKA_CANDIDATES} "
    "candidates (rank + vec_id tie-break -> identical sets cross-"
    "engine), full-dim exact rerank returns top-10. The standard "
    "nested-embedding bandwidth dial: the coarse pass reads 1/4 of the "
    "vector bytes; at 100 TB the prefix lives as its own column/index "
    "so the scan is truly narrower, and rerank cost is candidate-"
    "bounded",
    tags=("similarity", "ann", "matryoshka", "extension"),
)
def ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    qp = q.select(
        F.slice(F.col("qe"), 1, PREFIX_DIM).alias("qpe"), F.col("qe")
    ).withColumn("qpn2", norm2(F.col("qpe"))).withColumn(
        "qn2", norm2(F.col("qe"))
    )
    coarse = corpus.crossJoin(F.broadcast(qp)).select(
        "vec_id",
        "label",
        "embedding",
        "qe",
        "qn2",
        cosine_given_bnorm(
            F.slice(F.col("embedding"), 1, PREFIX_DIM),
            F.col("qpe"),
            F.col("qpn2"),
        ).alias("cosine_prefix"),
    )
    cands = coarse.orderBy(
        F.desc("cosine_prefix"), F.asc("vec_id")
    ).limit(MATRYOSHKA_CANDIDATES)
    return (
        cands.select(
            "vec_id",
            "label",
            cosine_given_bnorm(
                F.col("embedding"), F.col("qe"), F.col("qn2")
            ).alias("cosine"),
            "cosine_prefix",
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ann_matryoshka_recall_report",
    f"""
    WITH {_PREFIX_BASE},
    {_FULL_RERANK}
    , exact10 AS (
      SELECT f.vec_id
      FROM (
        SELECT cf.vec_id,
               CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                    AS DOUBLE) / {QV!r} AS dot
        FROM flat cf JOIN qf ON cf.i = qf.i
        WHERE cf.vec_id <> 0
        GROUP BY cf.vec_id
      ) f
      JOIN norms na ON na.vec_id = f.vec_id
      JOIN norms nq ON nq.vec_id = 0
      ORDER BY (f.dot / (sqrt(na.n2) * sqrt(nq.n2))) DESC, f.vec_id ASC
      LIMIT 10
    ),
    mat10 AS (
      SELECT vec_id FROM reranked
      ORDER BY cosine DESC, vec_id ASC LIMIT 10
    ),
    hits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM mat10 m JOIN exact10 x ON m.vec_id = x.vec_id
    ),
    ncorp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT 'matryoshka{PREFIX_DIM}' AS method, 10 AS k, hits.n_hits,
           (CAST(hits.n_hits AS DOUBLE) / 10.0) AS recall_at_10,
           CAST({MATRYOSHKA_CANDIDATES} AS BIGINT) AS n_candidates,
           ncorp.n_corpus,
           (CAST({MATRYOSHKA_CANDIDATES} * 64 + ncorp.n_corpus * {PREFIX_DIM}
                 AS DOUBLE)
              / CAST(ncorp.n_corpus * 64 AS DOUBLE)) AS bandwidth_fraction
    FROM hits, ncorp
    """,
    description="recall@10 of the Matryoshka two-stage against exact "
    "full-dim brute force, plus the vector-bytes bandwidth fraction "
    "the prefix pass actually reads — the nested-embedding trade as a "
    "hash-checked row",
    tags=("similarity", "ann", "matryoshka", "recall", "extension"),
)
def ann_matryoshka_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    exact = brute_force_topk(corpus, q, 10).select("vec_id")
    mat = ann_matryoshka_topk(spark, sf_dir).select("vec_id")
    hits = mat.join(exact, "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    ncorp = corpus.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    return hits.crossJoin(ncorp).select(
        F.lit(f"matryoshka{PREFIX_DIM}").alias("method"),
        F.lit(10).cast("int").alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.lit(10.0)).alias(
            "recall_at_10"
        ),
        F.lit(MATRYOSHKA_CANDIDATES).cast("bigint").alias("n_candidates"),
        "n_corpus",
        (
            (
                F.lit(MATRYOSHKA_CANDIDATES * 64).cast("long")
                + F.col("n_corpus") * F.lit(PREFIX_DIM)
            ).cast("double")
            / (F.col("n_corpus") * F.lit(64)).cast("double")
        ).alias("bandwidth_fraction"),
    )


# ------------------------------------------------- persisted MV index

_MV_INDEX_CACHE: dict[str, str] = {}


def _ensure_mv_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the chunk-bucket store ONCE per (process, dataset
    fingerprint) into a temp dir; probes read only the stored
    artifact (the _ensure_pq_index pattern)."""
    from ..operators.mv_index import build_mv_index
    from ..sources.tables import dataset_cache_key

    key = dataset_cache_key(sf_dir)
    path = _MV_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="mv_index_")
        build_mv_index(
            spark, load_table(spark, sf_dir, "embeddings"), path
        )
        _MV_INDEX_CACHE[key] = path
    return path


def _mv_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )


_MV_PRUNED_ORACLE = f"""
    WITH {_CHUNK_BASE},
    {_CHUNK_CANDS},
    {_maxsim_core("AND d.vec_id IN (SELECT vec_id FROM cands)")}
    SELECT s.vec_id, e.label, s.maxsim
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.maxsim DESC, s.vec_id ASC
    LIMIT 10
    """


@register(
    "maxsim_persisted_topk",
    _MV_PRUNED_ORACLE,
    description="two-stage MaxSim against the PERSISTED chunk-bucket "
    "store (operators/mv_index.py): chunks live partitioned by "
    "(batch_id, bgrp) with bucket a SORTED data column, so stage 1 "
    "pushes the query's <=4 buckets into the scan (bgrp dir pruning "
    "+ bucket row-group min/max skipping) — no corpus bucketing at "
    "query time (the in-plan pruned variant pays a corpus scan for "
    "stage 1; measured x100: in-plan pruned 7.7s vs exact 4.4s, "
    "PERF.md). Bit-identical to maxsim_pruned_topk, so it shares the "
    "oracle",
    tags=("similarity", "multivector", "maxsim", "index", "extension"),
)
def maxsim_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv_index import mv_probe_topk

    path = _ensure_mv_index(spark, sf_dir)
    return mv_probe_topk(spark, path, _mv_query(spark, sf_dir), 10)


@register(
    "mv_index_ingest_sim",
    _MV_PRUNED_ORACLE,
    description="incremental MV-index ingestion: the static build "
    "indexes vec_id%3==1 only, then two batch-id-keyed ingests append "
    "the rest (batch 1 REPLAYED once — dynamic overwrite rewrites "
    "exactly itself, so the replay is invisible); the stored-index "
    "probe must equal the all-at-once oracle exactly (chunking and "
    "bucketing are per-vector, so ingest batching cannot show)",
    tags=(
        "similarity", "multivector", "maxsim", "index", "streaming",
        "extension",
    ),
)
def mv_index_ingest_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.mv_index import (
        build_mv_index,
        ingest_mv_vectors,
        mv_probe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="mv_index_ingest_")
    corpus = emb.where(F.col("vec_id") != 0)
    build_mv_index(
        spark, emb, path, corpus=corpus.where(F.col("vec_id") % 3 == 1)
    )
    b1 = corpus.where(F.col("vec_id") % 3 == 2)
    b2 = corpus.where(F.col("vec_id") % 3 == 0)
    ingest_mv_vectors(spark, path, b1, 1)
    ingest_mv_vectors(spark, path, b2, 2)
    ingest_mv_vectors(spark, path, b1, 1)  # replay: must be a no-op
    return mv_probe_topk(spark, path, _mv_query(spark, sf_dir), 10)


@register(
    "mv_index_delete_sim",
    f"""
    WITH {_CHUNK_BASE},
    {_CHUNK_CANDS},
    {_maxsim_core(
        "AND d.vec_id IN (SELECT vec_id FROM cands)"
        " AND d.vec_id % 7 <> 3"
    )}
    SELECT s.vec_id, e.label, s.maxsim
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.maxsim DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="right-to-erasure on the MV index: every chunk row of "
    "vec_id%7==3 is physically removed from every generation (the "
    "shared partition-local eraser — only touched (batch_id, bucket) "
    "partitions rewrite, emptied partitions are deleted outright); "
    "the post-erasure probe must equal a never-contained index. "
    "MaxSim carries no corpus statistics, so erasure needs no "
    "correction bookkeeping",
    tags=(
        "similarity", "multivector", "maxsim", "index", "erasure",
        "extension",
    ),
)
def mv_index_delete_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.mv_index import (
        build_mv_index,
        delete_mv_vectors,
        mv_probe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="mv_index_delete_")
    build_mv_index(spark, emb, path)
    doomed = [
        r["vec_id"]
        for r in emb.where(
            (F.col("vec_id") % 7 == 3) & (F.col("vec_id") != 0)
        )
        .select("vec_id")
        .collect()
    ]
    delete_mv_vectors(spark, path, doomed)
    return mv_probe_topk(spark, path, _mv_query(spark, sf_dir), 10)


@register(
    "maxsim_batch_topk",
    f"""
    WITH {_CHUNK_BASE},
    signs16(p, j, s) AS (SELECT * FROM (VALUES {_SIGNS16_VALUES})),
    quantc AS (
      SELECT vec_id, c, j, CAST(FLOOR(x * {1e9!r} + 0.5) AS BIGINT) AS xq
      FROM chunkflat
    ),
    cprojs AS (
      SELECT q.vec_id, q.c, s.p, SUM(q.xq * s.s) AS proj
      FROM quantc q JOIN signs16 s ON q.j = s.j
      GROUP BY 1, 2, 3
    ),
    cbuckets AS (
      SELECT vec_id, c,
             CAST(SUM(CASE WHEN proj > 0 THEN CAST(POW(2, p) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS bucket
      FROM cprojs GROUP BY vec_id, c
    ),
    qcb AS (
      SELECT vec_id AS qid, bucket AS qbucket FROM cbuckets
      WHERE vec_id < 5
    ),
    cands AS (
      SELECT DISTINCT q.qid, b.vec_id
      FROM cbuckets b JOIN qcb q ON b.bucket = q.qbucket
      WHERE b.vec_id >= 5
    ),
    qcf AS (
      SELECT vec_id AS qid, c AS qc, j, x FROM chunkflat
      WHERE vec_id < 5
    ),
    pair AS (
      SELECT cd.qid, d.vec_id, d.c AS dc, q.qc,
             CAST(SUM(CAST(FLOOR(d.x * q.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM chunkflat d
      JOIN cands cd ON cd.vec_id = d.vec_id
      JOIN qcf q ON q.qid = cd.qid AND d.j = q.j
      GROUP BY 1, 2, 3, 4
    ),
    pcosr AS (
      SELECT p.qid, p.vec_id,
             (p.dot / (sqrt(dn.n2) * sqrt(qn.n2))) AS pcos, p.qc
      FROM pair p
      JOIN cnorms dn ON dn.vec_id = p.vec_id AND dn.c = p.dc
      JOIN cnorms qn ON qn.vec_id = p.qid AND qn.c = p.qc
    ),
    best AS (
      SELECT qid, vec_id,
             {_BEST_MAXES}
      FROM pcosr GROUP BY qid, vec_id
    ),
    scored AS (
      SELECT b.qid, b.vec_id, e.label,
             (((b.m0 + b.m1) + b.m2) + b.m3) AS maxsim
      FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
    )
    SELECT * FROM (
      SELECT qid, vec_id, label, maxsim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY maxsim DESC, vec_id ASC) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    description="batch MaxSim serving from the persisted chunk store: "
    "one stored-index scan answers 5 queries (vec_ids 0-4) at once — "
    "stage 1 prunes on the 20-row (query x chunk) broadcast bucket "
    "probe, candidates are per-query (qid, vec_id) pairs, stage 2 "
    "joins candidate chunk rows to their own query's chunks and ranks "
    "per query (the ann_batch_topk / pq_batch_probe_topk production "
    "shape carried to late interaction)",
    tags=(
        "similarity", "multivector", "maxsim", "index", "batch",
        "extension",
    ),
)
def maxsim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv_index import mv_batch_probe_topk

    path = _ensure_mv_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return mv_batch_probe_topk(
        spark, path, queries, 5, corpus_pred=F.col("vec_id") >= 5
    )


@register(
    "mv_index_compact_sim",
    _MV_PRUNED_ORACLE,
    description="MV chunk-store compaction transparency: build "
    "vec_id%3==1, ingest the other two thirds as batches 1-2, fold "
    "everything into one frozen generation (the shared two-phase "
    "compaction contract — new generation durably in place before "
    "sources drop), then probe; the result must equal the all-at-once "
    "oracle, with the store back to a single live generation",
    tags=(
        "similarity", "multivector", "maxsim", "index", "compaction",
        "extension",
    ),
)
def mv_index_compact_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.mv_index import (
        build_mv_index,
        compact_mv_index,
        ingest_mv_vectors,
        mv_probe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="mv_index_compact_")
    corpus = emb.where(F.col("vec_id") != 0)
    build_mv_index(
        spark, emb, path, corpus=corpus.where(F.col("vec_id") % 3 == 1)
    )
    ingest_mv_vectors(spark, path, corpus.where(F.col("vec_id") % 3 == 2), 1)
    ingest_mv_vectors(spark, path, corpus.where(F.col("vec_id") % 3 == 0), 2)
    n_folded = compact_mv_index(spark, path, upto_batch_id=3)
    assert n_folded == 3, n_folded  # frozen build + two ingest batches
    gens = (
        spark.read.parquet(f"{path}/chunks")
        .select("batch_id")
        .distinct()
        .count()
    )
    assert gens == 1, gens  # single frozen generation after the fold
    return mv_probe_topk(spark, path, _mv_query(spark, sf_dir), 10)


@register(
    "stream_mv_ingest",
    _MV_PRUNED_ORACLE,
    description="REAL Structured Streaming proof for the MV chunk "
    "store: the non-frozen two thirds of the corpus arrive as "
    "mtime-ordered one-file-per-group parquet through "
    "maxFilesPerTrigger=1 into the foreachBatch MV sink (store batch "
    "ids keyed off the data's group id, not the trigger counter), "
    "then the WHOLE stream reprocesses from a fresh checkpoint — "
    "every ingest rewrites byte-identically because chunking and "
    "bucketing depend only on the vector itself.  The stored-index "
    "probe must equal the all-at-once oracle",
    tags=(
        "similarity", "multivector", "maxsim", "index", "streaming",
        "extension",
    ),
)
def stream_mv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import tempfile

    from ..operators.mv_index import build_mv_index, mv_probe_topk
    from ..streaming import await_or_raise
    from ..streaming.mv_ingest import mv_ingest_sink

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    tmp = tempfile.mkdtemp(prefix="stream_mv_")
    path = f"{tmp}/mvidx"
    build_mv_index(
        spark, emb, path, corpus=corpus.where(F.col("vec_id") % 3 == 1)
    )
    grp = (F.col("vec_id") % 3 == 2).cast("int")  # 1 -> grp 1, 0 -> grp 0
    src = f"{tmp}/src"
    (
        corpus.where(F.col("vec_id") % 3 != 1)
        .withColumn("grp", grp)
        .coalesce(1)
        .write.partitionBy("grp")
        .mode("overwrite")
        .parquet(src)
    )
    base = os.path.getmtime(src) - 3600
    for g in (0, 1):
        for f in glob.glob(f"{src}/grp={g}/*.parquet"):
            os.utime(f, (base + g, base + g))
    sink = mv_ingest_sink(path)
    for run in (1, 2):  # run 2 = full reprocess, fresh checkpoint
        q = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>, label int, grp int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt{run}")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 600)
    return mv_probe_topk(spark, path, _mv_query(spark, sf_dir), 10)
