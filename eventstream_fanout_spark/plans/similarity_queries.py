"""Similarity-search queries over ``embeddings`` with DuckDB oracles.

The oracles reproduce the quantized integer vector math exactly
(functions/vectors.py); the LSH oracle inlines the same md5-derived
hyperplane signs the Spark operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import sql_davg
from ..functions.vectors import QV, norm2
from ..operators.similarity import (
    NUM_HYPERPLANES,
    brute_force_topk,
    embedding_near_pairs,
    hyperplane_signs,
    lsh_topk,
)
from ..sources.tables import dataset_cache_key, load_table
from .registry import register

_FLAT = f"""
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
  )
"""


def _query_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )


@register(
    "ann_cosine_topk",
    f"""
    WITH {_FLAT},
    qf AS (SELECT i, x FROM flat WHERE vec_id = 0),
    sums AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat cf JOIN qf ON cf.i = qf.i
      WHERE cf.vec_id <> 0
      GROUP BY cf.vec_id
    )
    SELECT s.vec_id, e.label,
           (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) AS cosine
    FROM sums s
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = 0
    JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY cosine DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="brute-force cosine top-10 neighbors of vec 0 (exact ANN "
    "baseline; broadcast query, partition-parallel scan, TakeOrdered top-k)",
    tags=("similarity", "ann", "extension"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    return brute_force_topk(corpus, _query_vec(spark, sf_dir), 10)


@register(
    "ann_batch_topk",
    f"""
    WITH {_FLAT},
    queries AS (SELECT vec_id AS qid, i, x FROM flat WHERE vec_id < 5),
    corpus AS (SELECT vec_id, i, x FROM flat WHERE vec_id >= 5),
    sums AS (
      SELECT q.qid, c.vec_id,
             CAST(SUM(CAST(FLOOR(c.x * q.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM corpus c JOIN queries q ON c.i = q.i
      GROUP BY q.qid, c.vec_id
    ),
    scored AS (
      SELECT s.qid, s.vec_id,
             (s.dot / (sqrt(nc.n2) * sqrt(nq.n2))) AS cosine
      FROM sums s
      JOIN norms nc ON nc.vec_id = s.vec_id
      JOIN norms nq ON nq.vec_id = s.qid
    )
    SELECT * FROM (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    description="batch ANN: top-5 neighbors for a batch of 5 query "
    "vectors in one pass (broadcast query batch, row_number per query — "
    "the production shape: one scan serves the whole query batch)",
    tags=("similarity", "ann", "extension"),
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine as _cosine

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    corpus = emb.where(F.col("vec_id") >= 5).select("vec_id", "embedding")
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "qid",
        "vec_id",
        _cosine(F.col("embedding"), F.col("qe")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )


# --- LSH-bucketed ANN (scale path) -------------------------------------

_SIGNS_VALUES = ", ".join(
    f"({j}, {i + 1}, {s})"
    for j in range(NUM_HYPERPLANES)
    for i, s in enumerate(hyperplane_signs(j))
)

_BUCKETS = f"""
  signs(j, i, s) AS (SELECT * FROM (VALUES {_SIGNS_VALUES})),
  quant AS (
    SELECT vec_id, i,
           CAST(FLOOR(x * {1e9!r} + 0.5) AS BIGINT) AS xq
    FROM flat
  ),
  projs AS (
    SELECT q.vec_id, s.j, SUM(q.xq * s.s) AS proj
    FROM quant q JOIN signs s ON q.i = s.i
    GROUP BY 1, 2
  ),
  buckets AS (
    SELECT vec_id,
           CAST(SUM(CASE WHEN proj > 0 THEN CAST(POW(2, j) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS bucket
    FROM projs GROUP BY vec_id
  )
"""


@register(
    "ann_lsh_bucket_topk",
    f"""
    WITH {_FLAT},
    {_BUCKETS},
    qf AS (SELECT i, x FROM flat WHERE vec_id = 0),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    cands AS (
      SELECT b.vec_id, b.bucket FROM buckets b, qb
      WHERE b.bucket = qb.qbucket AND b.vec_id <> 0
    ),
    sums AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat cf JOIN qf ON cf.i = qf.i
      WHERE cf.vec_id IN (SELECT vec_id FROM cands)
      GROUP BY cf.vec_id
    )
    SELECT s.vec_id, e.label, c.bucket,
           (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) AS cosine
    FROM sums s
    JOIN cands c ON c.vec_id = s.vec_id
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = 0
    JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY cosine DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="LSH-bucketed ANN top-10 (8 md5-derived hyperplanes -> "
    "8-bit bucket; probe only the query's bucket — the 100 TB scale path)",
    tags=("similarity", "ann", "lsh", "extension"),
)
def ann_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    return lsh_topk(corpus, _query_vec(spark, sf_dir), 10)


@register(
    "embedding_near_pairs",
    f"""
    WITH {_FLAT},
    pairsums AS (
      SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
             CAST(SUM(CAST(FLOOR(a.x * b.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
      WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0
      GROUP BY 1, 2
    )
    SELECT p.vid_a, p.vid_b,
           (p.dot / (sqrt(na.n2) * sqrt(nb.n2))) AS cosine
    FROM pairsums p
    JOIN norms na ON na.vec_id = p.vid_a
    JOIN norms nb ON nb.vec_id = p.vid_b
    WHERE (p.dot / (sqrt(na.n2) * sqrt(nb.n2))) >= 0.4
    """,
    description="ground-truth embedding-cosine pairs (cosine >= 0.4) on "
    "an explicitly capped deterministic sample (vec_id % 4 == 0) — the "
    "brute-force recall verifier; embedding_lsh_near_pairs is the "
    "unbounded-corpus scale path",
    tags=("similarity", "dedup", "extension"),
)
def embedding_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, 0.4, sample_mod=4)


@register(
    "embedding_lsh_near_pairs",
    f"""
    WITH {_FLAT},
    {_BUCKETS},
    cand AS (
      SELECT a.vec_id AS vid_a, b.vec_id AS vid_b
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    pairsums AS (
      SELECT fa.vec_id AS vid_a, fb.vec_id AS vid_b,
             CAST(SUM(CAST(FLOOR(fa.x * fb.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat fa
      JOIN flat fb ON fa.i = fb.i
      JOIN cand c ON c.vid_a = fa.vec_id AND c.vid_b = fb.vec_id
      GROUP BY 1, 2
    )
    SELECT p.vid_a, p.vid_b,
           (p.dot / (sqrt(na.n2) * sqrt(nb.n2))) AS cosine
    FROM pairsums p
    JOIN norms na ON na.vec_id = p.vid_a
    JOIN norms nb ON nb.vec_id = p.vid_b
    WHERE (p.dot / (sqrt(na.n2) * sqrt(nb.n2))) >= 0.15
    """,
    description="embedding near-dup pairs via LSH buckets: score only "
    "same-bucket pairs (the n² -> bucket-local scale path), cosine >= 0.15",
    tags=("similarity", "dedup", "lsh", "extension"),
)
def embedding_lsh_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_given_norms as _cgn
    from ..functions.vectors import norm2 as _norm2
    from ..operators.dedup import _salted_bucket_pairs
    from ..operators.similarity import lsh_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    # norm once per ROW before the pair join (bit-identical to
    # cosine(): same BIGINT sums, same IEEE combine) — the per-pair
    # work in the bucket-quadratic join is one fold, not three
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
        _norm2(F.col("embedding")).alias("n2"),
    )
    # same lossless hot-bucket salting as the MinHash/SimHash joins: a
    # dense embedding cluster concentrating one LSH bucket splits into
    # bounded salted sub-tasks instead of one quadratic task
    return (
        _salted_bucket_pairs(bucketed, ["bucket"], "vec_id")
        .select(
            F.col("a.vec_id").alias("vid_a"),
            F.col("b.vec_id").alias("vid_b"),
            _cgn(
                F.col("a.embedding"),
                F.col("b.embedding"),
                F.col("a.n2"),
                F.col("b.n2"),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.15)
    )


@register(
    "higher_order_array_functions",
    f"""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           (CAST(list_sum(list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * {QV!r} + 0.5)
                           AS BIGINT))) AS DOUBLE) / {QV!r}) AS comp_sum,
           (CAST(list_sum(list_transform(embedding,
                 x -> CAST(FLOOR(CAST(CASE WHEN x > 0.1 THEN 0.1
                                            WHEN x < -0.1 THEN -0.1
                                            ELSE x END AS DOUBLE) * {QV!r}
                                 + 0.5) AS BIGINT))) AS DOUBLE) / {QV!r})
             AS clipped_sum
    FROM embeddings
    """,
    description="higher-order array functions as first-class ops: "
    "filter (positive count), transform+aggregate (quantized component "
    "sum), clamp-then-sum — the per-row vector toolkit, JVM-side",
    tags=("similarity", "array", "higher-order"),
)
def higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")

    def qsum(arr):
        q = F.transform(
            arr,
            lambda v: F.floor(
                v.cast("double") * F.lit(QV) + F.lit(0.5)
            ).cast("long"),
        )
        return (
            F.aggregate(q, F.lit(0).cast("long"), lambda a, b: a + b)
            .cast("double")
            / F.lit(QV)
        )

    clipped = F.transform(
        x,
        lambda v: F.when(v > 0.1, F.lit(0.1).cast("float"))
        .when(v < -0.1, F.lit(-0.1).cast("float"))
        .otherwise(v),
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(x, lambda v: v > 0)).alias("n_positive"),
        qsum(x).alias("comp_sum"),
        qsum(clipped).alias("clipped_sum"),
    )


@register(
    "embedding_label_stats",
    f"""
    WITH {_FLAT}
    SELECT e.label,
           COUNT(*) AS n_vectors,
           {sql_davg('sqrt(n.n2)')} AS mean_norm
    FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    GROUP BY e.label
    """,
    description="per-label vector counts and mean L2 norm (array agg + "
    "deterministic mean)",
    tags=("similarity", "agg", "extension"),
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.core import davg

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.sqrt(norm2(F.col("embedding"))).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            davg(F.col("norm"), "mean_norm"),
        )
    )


@register(
    "hard_negative_mining",
    f"""
    WITH {_FLAT},
    anchors AS (SELECT vec_id AS qid, i, x FROM flat WHERE vec_id < 5),
    corpus AS (SELECT vec_id, i, x FROM flat WHERE vec_id >= 5),
    sums AS (
      SELECT a.qid, c.vec_id,
             CAST(SUM(CAST(FLOOR(c.x * a.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM corpus c JOIN anchors a ON c.i = a.i
      GROUP BY a.qid, c.vec_id
    ),
    scored AS (
      SELECT s.qid, s.vec_id, ec.label AS neg_label, ea.label AS qlabel,
             (s.dot / (sqrt(nc.n2) * sqrt(nq.n2))) AS cosine
      FROM sums s
      JOIN norms nc ON nc.vec_id = s.vec_id
      JOIN norms nq ON nq.vec_id = s.qid
      JOIN embeddings ec ON ec.vec_id = s.vec_id
      JOIN embeddings ea ON ea.vec_id = s.qid
      WHERE ec.label <> ea.label
    )
    SELECT qid, vec_id AS negative_id, neg_label, cosine, rank FROM (
      SELECT qid, vec_id, neg_label, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, vec_id ASC)
                  AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 2
    """,
    description="hard-negative mining for contrastive training: for "
    "each anchor vector, the top-2 most-similar vectors with a "
    "DIFFERENT label — the highest-loss negatives a contrastive batch "
    "wants; one corpus scan serves the whole anchor batch (broadcast "
    "anchors), per-anchor top-k window. At 100 TB the LSH-bucketed "
    "probe replaces the scan, same as ann_lsh_bucket_topk",
    tags=("similarity", "mining", "extension"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine as _cosine

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.where(F.col("vec_id") >= 5).select(
        "vec_id", "embedding", F.col("label").alias("neg_label")
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .where(F.col("neg_label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            "neg_label",
            _cosine(F.col("embedding"), F.col("qe")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 2)
        .select(
            "qid",
            F.col("vec_id").alias("negative_id"),
            "neg_label",
            "cosine",
            "rank",
        )
    )


@register(
    "embedding_int8_quantization",
    """
    WITH flat2 AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    ranges AS (
      SELECT vec_id, MIN(x) AS lo, MAX(x) AS hi FROM flat2 GROUP BY vec_id
    ),
    coded AS (
      SELECT f.vec_id, f.x, r.lo, r.hi,
             CASE WHEN r.hi = r.lo THEN 0.0
                  ELSE FLOOR((f.x - r.lo) / ((r.hi - r.lo) / 255.0) + 0.5)
             END AS code
      FROM flat2 f JOIN ranges r ON r.vec_id = f.vec_id
    ),
    errs AS (
      SELECT vec_id, lo, hi,
             ABS(lo + code * (CASE WHEN hi = lo THEN 0.0
                              ELSE (hi - lo) / 255.0 END) - x) AS err
      FROM coded
    )
    SELECT vec_id, MIN(lo) AS lo, MIN(hi) AS hi, MAX(err) AS max_abs_err
    FROM errs
    GROUP BY vec_id
    """,
    description="int8 embedding quantization (the storage format for "
    "100 TB vector stores): per-vector min/max affine scale to 0..255 "
    "codes, dequantization error bounded by scale/2 — pure IEEE "
    "arithmetic identical in both engines; one explode + two partial "
    "aggs (error-bound property also pinned in pytest)",
    tags=("similarity", "quantization", "extension"),
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    lo = F.array_min(x)
    hi = F.array_max(x)
    scale = F.when(hi == lo, F.lit(0.0)).otherwise(
        (hi - lo) / F.lit(255.0)
    )
    code = F.transform(
        x,
        lambda v: F.when(hi == lo, F.lit(0.0)).otherwise(
            F.floor((v - lo) / ((hi - lo) / F.lit(255.0)) + F.lit(0.5))
        ),
    )
    errs = F.zip_with(
        code, x, lambda c, v: F.abs(lo + c * scale - v)
    )
    return emb.select(
        "vec_id",
        lo.alias("lo"),
        hi.alias("hi"),
        F.array_max(errs).alias("max_abs_err"),
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH {_FLAT},
    cent AS (SELECT vec_id AS cid, i, x FROM flat
             WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, cent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * cent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN cent ON corp.i = cent.i
      GROUP BY 1, 2
    ),
    acos AS (
      SELECT a.vec_id, a.cid,
             (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) AS ccos
      FROM adots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.cid
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    ),
    qdots AS (
      SELECT cent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * cent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN cent ON qf.i = cent.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    ),
    probes AS (
      SELECT q.cid FROM qdots q
      JOIN norms nq ON nq.vec_id = 0
      JOIN norms nc ON nc.vec_id = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC, q.cid ASC
      LIMIT 2
    ),
    cdots AS (
      SELECT corp.vec_id,
             CAST(SUM(CAST(FLOOR(corp.x * qf.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp
      JOIN (SELECT i, x FROM flat WHERE vec_id = 0) qf ON corp.i = qf.i
      WHERE corp.vec_id IN (
        SELECT a.vec_id FROM assign a JOIN probes p ON a.list_id = p.cid
      )
      GROUP BY 1
    )
    SELECT c.vec_id, e.label, a.list_id,
           (c.dot / (sqrt(nv.n2) * sqrt(nq.n2))) AS cosine
    FROM cdots c
    JOIN assign a ON a.vec_id = c.vec_id
    JOIN norms nv ON nv.vec_id = c.vec_id
    JOIN norms nq ON nq.vec_id = 0
    JOIN embeddings e ON e.vec_id = c.vec_id
    ORDER BY cosine DESC, c.vec_id ASC
    LIMIT 10
    """,
    description="IVF-Flat ANN top-10: 8 deterministic seed centroids, "
    "nearest-centroid inverted lists (broadcast centroids -> pure map "
    "assignment + tiny-payload argmax agg), query probes its 2 nearest "
    "lists and brute-forces only those (~nprobe/k of the corpus). The "
    "second ANN scale path next to LSH buckets; nprobe is the "
    "recall/scan-fraction dial. In production the centroids are a "
    "k-means artifact broadcast like the LSH hyperplanes; index build "
    "is one scan, amortized over all queries",
    tags=("similarity", "ann", "ivf", "extension"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    return ivf_topk(corpus, _query_vec(spark, sf_dir), 10)


@register(
    "label_balanced_sample",
    """
    SELECT vec_id, label FROM (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
                                         vec_id ASC) AS rn
      FROM embeddings
    ) WHERE rn <= 25
    """,
    description="label-balanced embedding sample: exactly 25 vectors "
    "per label chosen by hash order (deterministic, unbiased within "
    "class) — the class-rebalance step before training a probe/"
    "classifier on skewed labels; one shuffle on the label key",
    tags=("similarity", "sampling", "extension"),
)
def label_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .select("vec_id", "label")
    )


# --- random projection (JL) dimensionality reduction -------------------

_RP_DIMS = 16

_RP_SIGNS_VALUES = ", ".join(
    f"({j}, {i + 1}, {s})"
    for j in range(_RP_DIMS)
    for i, s in enumerate(hyperplane_signs(j))
)


def _rp_sq_chain(prefix: str = "p") -> str:
    """Left-associated p0*p0 + ... chain, written identically in both
    engines so the IEEE addition order matches."""
    return " + ".join(f"{prefix}{j}*{prefix}{j}" for j in range(_RP_DIMS))


@register(
    "embedding_random_projection",
    f"""
    WITH {_FLAT},
    signs(j, i, s) AS (SELECT * FROM (VALUES {_RP_SIGNS_VALUES})),
    projs AS (
      SELECT f.vec_id, s.j,
             CAST(SUM(CAST(FLOOR(f.x * s.s * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS p
      FROM flat f JOIN signs s ON f.i = s.i
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT vec_id,
             {", ".join(f"MAX(CASE WHEN j = {j} THEN p END) AS p{j}"
                        for j in range(_RP_DIMS))}
      FROM projs GROUP BY vec_id
    )
    SELECT w.vec_id,
           {", ".join(f"w.p{j}" for j in range(_RP_DIMS))},
           ((({_rp_sq_chain("w.p")}) / {float(_RP_DIMS)!r}) / n.n2)
             AS norm_ratio
    FROM wide w JOIN norms n ON n.vec_id = w.vec_id
    """,
    description="Johnson-Lindenstrauss random projection 64 -> 16 dims "
    "via deterministic md5-derived +-1 hyperplanes (the cheap distance-"
    "preserving prefilter in front of exact ANN re-ranking at 100 TB); "
    "norm_ratio = reduced/original squared norm, expectation 1 — the "
    "JL guarantee, mean-bounded in pytest. Pure per-row JVM fold, zero "
    "shuffles",
    tags=("similarity", "projection", "extension"),
)
def embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.vectors import dot, norm2 as _norm2

    emb = load_table(spark, sf_dir, "embeddings")
    proj_cols = []
    for j in range(_RP_DIMS):
        signs = F.array(
            *[F.lit(float(s)) for s in hyperplane_signs(j)]
        )
        proj_cols.append(dot(F.col("embedding"), signs).alias(f"p{j}"))
    wide = emb.select("vec_id", *proj_cols, _norm2(F.col("embedding")).alias("n2"))
    sq = None
    for j in range(_RP_DIMS):
        term = F.col(f"p{j}") * F.col(f"p{j}")
        sq = term if sq is None else sq + term
    return wide.select(
        "vec_id",
        *[F.col(f"p{j}") for j in range(_RP_DIMS)],
        ((sq / F.lit(float(_RP_DIMS))) / F.col("n2")).alias("norm_ratio"),
    )


# --- ANN recall report (quality of the scale paths, driver-visible) ----


def _ann_recall_oracle() -> str:
    from .registry import QUERIES

    brute = QUERIES["ann_cosine_topk"].oracle
    lsh = QUERIES["ann_lsh_bucket_topk"].oracle
    ivf = QUERIES["ann_ivf_topk"].oracle
    return f"""
    WITH brute AS (SELECT vec_id FROM ({brute})),
    lsh AS (SELECT vec_id FROM ({lsh})),
    ivf AS (SELECT vec_id FROM ({ivf}))
    SELECT 'lsh' AS method, CAST(10 AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           (CAST(COUNT(*) AS DOUBLE) / 10.0) AS recall_at_10
    FROM lsh JOIN brute USING (vec_id)
    UNION ALL
    SELECT 'ivf' AS method, CAST(10 AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           (CAST(COUNT(*) AS DOUBLE) / 10.0) AS recall_at_10
    FROM ivf JOIN brute USING (vec_id)
    """


@register(
    "ann_recall_report",
    _ann_recall_oracle(),
    description="recall@10 of both ANN scale paths (LSH bucket probe, "
    "IVF nprobe=2) against the exact brute-force top-10 — the "
    "quality-vs-scan-fraction dial made a first-class, hash-checked "
    "query instead of a buried test assertion. Composes the three "
    "registered top-k plans; everything stays deterministic so even "
    "the recall fractions hash-match the oracle",
    tags=("similarity", "ann", "recall", "extension"),
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    q = _query_vec(spark, sf_dir)
    brute = brute_force_topk(corpus, q, 10).select("vec_id")
    lsh = lsh_topk(corpus, q, 10).select("vec_id")
    ivf = ivf_topk(corpus, q, 10).select("vec_id")

    def report(df: DataFrame, label: str) -> DataFrame:
        return df.join(brute, "vec_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits")
        ).select(
            F.lit(label).alias("method"),
            F.lit(10).cast("int").alias("k"),
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(10.0)).alias(
                "recall_at_10"
            ),
        )

    return report(lsh, "lsh").unionAll(report(ivf, "ivf"))


@register(
    "ann_multiprobe_topk",
    f"""
    WITH {_FLAT},
    {_BUCKETS},
    qf AS (SELECT i, x FROM flat WHERE vec_id = 0),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    probes AS (
      SELECT qbucket, qbucket AS pbucket FROM qb
      UNION ALL
      SELECT qbucket, xor(qbucket, CAST(1 << g.i AS BIGINT)) AS pbucket
      FROM qb, generate_series(0, 7) AS g(i)
    ),
    cands AS (
      SELECT b.vec_id, b.bucket, p.qbucket
      FROM buckets b JOIN probes p ON b.bucket = p.pbucket
      WHERE b.vec_id <> 0
    ),
    sums AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat cf JOIN qf ON cf.i = qf.i
      WHERE cf.vec_id IN (SELECT vec_id FROM cands)
      GROUP BY cf.vec_id
    )
    SELECT s.vec_id, e.label, c.bucket,
           CAST(bit_count(xor(c.bucket, c.qbucket)) AS INTEGER)
             AS probe_hamming,
           (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) AS cosine
    FROM sums s
    JOIN cands c ON c.vec_id = s.vec_id
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = 0
    JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY cosine DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="multi-probe LSH ANN top-10: probe the query's bucket "
    "PLUS its 8 Hamming-1 neighbors (flip each hyperplane bit once) — "
    "the standard multi-probe recall dial beside IVF's nprobe; "
    "candidates stay bucket-local (9 constant probe rows broadcast), "
    "probe_hamming reports the ring each hit came from",
    tags=("similarity", "ann", "lsh", "multiprobe", "extension"),
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    return lsh_multiprobe_topk(corpus, _query_vec(spark, sf_dir), 10)


# --- fitted-IVF ANN (VERDICT r4 item 5) --------------------------------

_IVF_FIT_ITERS = 2


def _fitted_chain_ctes(
    n_iters: int,
    sfx: str = "",
    fit_flat: str = "flat",
    fit_norms: str = "norms",
    enc_flat: str | None = None,
    enc_norms: str | None = None,
) -> tuple[list[str], int, str]:
    """Suffix-parameterized Lloyd replay (round 11): the fit runs over
    ``fit_flat``/``fit_norms`` while the FINAL corpus assignment (the
    ``asg{fin}{sfx}`` relation probes consume) runs over
    ``enc_flat``/``enc_norms`` — defaulting to the fit source.  The
    split is what the quantizer-drift oracle needs: a STALE index fits
    on the original corpus but encodes post-churn values against the
    frozen artifacts (fit=orig, encode=updated), while the fresh-fit
    twin uses one source for both.  ``sfx`` disambiguates chains
    coexisting in one query.  Does NOT emit the flat/norms CTEs —
    callers own those (two chains share them)."""
    enc_flat = enc_flat or fit_flat
    enc_norms = enc_norms or fit_norms
    ctes = [
        f"corp{sfx} AS (SELECT vec_id, i, x FROM {fit_flat} "
        "WHERE vec_id <> 0)",
        # generation 0: the deterministic seed centroids, flat form
        f"cf0{sfx} AS (SELECT vec_id AS cid, i, x FROM {fit_flat} "
        "WHERE vec_id BETWEEN 10 AND 17)",
    ]
    enc_corp = f"corp{sfx}"
    if enc_flat != fit_flat:
        ctes.append(
            f"ecorp{sfx} AS (SELECT vec_id, i, x FROM {enc_flat} "
            "WHERE vec_id <> 0)"
        )
        enc_corp = f"ecorp{sfx}"
    prev = f"cf0{sfx}"
    # each round t: centroid norms -> quantized dots -> argmax assign
    # -> quantized per-element FLOAT mean -> fold (empty lists keep
    # their previous centroid, the COALESCE); the final round (t >
    # n_iters) assigns the ENCODE corpus instead of iterating
    for t in range(1, n_iters + 2):
        corp = f"corp{sfx}" if t <= n_iters else enc_corp
        nv = fit_norms if t <= n_iters else enc_norms
        ctes.append(
            f"""cn{t}{sfx} AS (
      SELECT cid, CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                       AS DOUBLE) / {QV!r} AS n2
      FROM {prev} GROUP BY cid
    )"""
        )
        ctes.append(
            f"""ad{t}{sfx} AS (
      SELECT {corp}.vec_id, c.cid,
             CAST(SUM(CAST(FLOOR({corp}.x * c.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM {corp} JOIN {prev} c ON {corp}.i = c.i
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""asg{t}{sfx} AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(cn.n2))) DESC,
                          a.cid ASC) AS rn
        FROM ad{t}{sfx} a
        JOIN {nv} nv ON nv.vec_id = a.vec_id
        JOIN cn{t}{sfx} cn ON cn.cid = a.cid
      ) WHERE rn = 1
    )"""
        )
        if t > n_iters:
            return ctes, t, prev
        ctes.append(
            f"""mn{t}{sfx} AS (
      SELECT s.list_id AS cid, corp{sfx}.i,
             CAST(CAST(
               (CAST(SUM(CAST(FLOOR(corp{sfx}.x * {QV!r} + 0.5) AS BIGINT))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {QV!r}
               AS FLOAT) AS DOUBLE) AS x
      FROM corp{sfx} JOIN asg{t}{sfx} s ON s.vec_id = corp{sfx}.vec_id
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""cf{t}{sfx} AS (
      SELECT p.cid, p.i, COALESCE(m.x, p.x) AS x
      FROM {prev} p LEFT JOIN mn{t}{sfx} m ON m.cid = p.cid AND m.i = p.i
    )"""
        )
        prev = f"cf{t}{sfx}"
    raise AssertionError("unreachable: loop always returns at fin")


def _fitted_centroid_ctes(n_iters: int) -> tuple[list[str], int, str]:
    """The shared CTE chain replaying ``ivf_fit_centroids``: returns
    ``(ctes, fin, prev)`` where ``ctes`` covers flat/norms/corp and
    the per-iteration (assign, mean, fold) rounds, ``asg{fin}`` is the
    final corpus assignment under the fitted centroids, ``cn{fin}``
    their norms, and ``prev`` names the final fitted-centroid flat
    relation.  Used by the fitted IVF-Flat oracle AND the fitted
    persisted-PQ-index oracle (round 7) — one replay of the Lloyd
    machinery, two probe tails.  Since round 11 a thin wrapper over
    the suffix-parameterized :func:`_fitted_chain_ctes` (the
    drift-report oracle runs two chains in one query)."""
    chain, fin, prev = _fitted_chain_ctes(n_iters)
    return [_FLAT.strip(), *chain], fin, prev


def _ivf_fitted_oracle(n_iters: int = _IVF_FIT_ITERS) -> str:
    """DuckDB replay of ``ivf_fit_centroids`` + ``ivf_topk``: the Lloyd
    iterations are integer-exact by design (quantized BIGINT sums, the
    per-element mean cast through FLOAT exactly as the Spark side's
    ``.cast("float")``), so the fitted index — not just the final
    top-k — is reproduced bit-for-bit.  Generated programmatically:
    one (assign, mean, fold) CTE round per iteration
    (:func:`_fitted_centroid_ctes`), then the same probe/scan tail as
    the seed-centroid ``ann_ivf_topk`` oracle."""
    ctes, fin, prev = _fitted_centroid_ctes(n_iters)
    ctes.append(
        f"""qd AS (
      SELECT c.cid,
             CAST(SUM(CAST(FLOOR(qf.x * c.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN {prev} c ON qf.i = c.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT q.cid FROM qd q
      JOIN norms nq ON nq.vec_id = 0
      JOIN cn{fin} cn ON cn.cid = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(cn.n2))) DESC, q.cid ASC
      LIMIT 2
    )"""
    )
    ctes.append(
        f"""cd AS (
      SELECT corp.vec_id,
             CAST(SUM(CAST(FLOOR(corp.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM corp
      JOIN (SELECT i, x FROM flat WHERE vec_id = 0) qf ON corp.i = qf.i
      WHERE corp.vec_id IN (
        SELECT a.vec_id FROM asg{fin} a JOIN probes p ON a.list_id = p.cid
      )
      GROUP BY 1
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT c.vec_id, e.label, a.list_id,
           (c.dot / (sqrt(nv.n2) * sqrt(nq.n2))) AS cosine
    FROM cd c
    JOIN asg{fin} a ON a.vec_id = c.vec_id
    JOIN norms nv ON nv.vec_id = c.vec_id
    JOIN norms nq ON nq.vec_id = 0
    JOIN embeddings e ON e.vec_id = c.vec_id
    ORDER BY cosine DESC, c.vec_id ASC
    LIMIT 10
    """


@register(
    "ann_ivf_fitted_topk",
    _ivf_fitted_oracle(),
    description="IVF-Flat ANN top-10 over the FITTED coarse quantizer "
    "(2 deterministic Lloyd iterations from the seed init, quantized "
    "integer means — operators/similarity.py:ivf_fit_centroids), "
    "nprobe=2.  The production IVF path: sampled k-means fit -> "
    "broadcast-k assignment -> probe the nearest lists; the oracle "
    "replays the entire fit bit-for-bit (integer-exact means were the "
    "point of the quantized design), so the driver hash pins the "
    "index, not just the answer",
    tags=("similarity", "ann", "ivf", "extension"),
)
def ann_ivf_fitted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_fit_centroids, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    cents = ivf_fit_centroids(corpus, n_iters=_IVF_FIT_ITERS, sample_mod=1)
    return ivf_topk(corpus, _query_vec(spark, sf_dir), 10, centroids=cents)


# --- product quantization (PQ) ANN with asymmetric distance (round 5) --

_PQ_SUBS = 8          # subspaces
_PQ_SUBDIM = 8        # dims per subspace (8 x 8 = 64 = EMBED_DIM)


def _pq_oracle() -> str:
    """DuckDB replay of PQ encode + ADC scan.  All distances are exact
    BIGINT sums of nano-quantized squared differences — no division,
    no sqrt — so the encoded corpus, the query distance table, and the
    final ADC scores are integer-identical across engines."""
    return f"""
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    cent AS (
      SELECT vec_id AS cid, s, i, x FROM sub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    corp AS (SELECT vec_id, s, i, x FROM sub WHERE vec_id <> 0),
    dists AS (
      SELECT corp.vec_id, corp.s, cent.cid,
             SUM(CAST(FLOOR((corp.x - cent.x) * (corp.x - cent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM corp JOIN cent ON corp.i = cent.i AND corp.s = cent.s
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    qtable AS (
      SELECT cent.s, cent.cid,
             SUM(CAST(FLOOR((qf.x - cent.x) * (qf.x - cent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM sub WHERE vec_id = 0) qf
      JOIN cent ON cent.i = qf.i AND cent.s = qf.s
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM codes c JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
    )
    SELECT a.vec_id, e.label, a.adc_dist
    FROM adc a JOIN embeddings e ON e.vec_id = a.vec_id
    ORDER BY a.adc_dist ASC, a.vec_id ASC
    LIMIT 10
    """


@register(
    "ann_pq_adc_topk",
    _pq_oracle(),
    description="product-quantization ANN top-10 with asymmetric "
    "distance computation: the 64-dim embedding splits into 8 "
    "subspaces, each encoded to its nearest of 8 deterministic "
    "codebook centroids (seed rows sliced per subspace), and the query "
    "scans CODES ONLY — one 64-entry broadcast distance table, "
    "per-doc cost 8 table lookups + a sum instead of 64 multiplies "
    "(and at 100 TB the encoded corpus is 8 bytes/vector instead of "
    "256 — the memory-bound ANN standard next to IVF/LSH).  All "
    "distances are exact BIGINT sums of nano-quantized squared "
    "differences, so encode, table, and ADC scores hash-match the "
    "oracle with no float tolerance",
    tags=("similarity", "ann", "pq", "extension"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    adc = _pq_adc_scores(spark, sf_dir)
    return (
        adc.join(emb.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", "adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(10)
    )


# the subspace-slicing and quantized-L2 primitives are shared with the
# persisted-index operator (operators/ann_index.py) — one source of
# truth, so the in-plan encode and the stored index are bit-identical
from ..operators.ann_index import l2q as _l2q  # noqa: E402
from ..operators.ann_index import pq_subspaces as _pq_subspaces  # noqa: E402


def _pq_adc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, adc_dist) for the whole corpus: PQ encode + ADC sum.
    Encode broadcasts the 64-row codebook and argmins per (vector,
    subspace); the query side is a broadcast 64-entry distance table.

    Codebook contract: like ivf_centroids, the seed rows 10..17 play
    the per-subspace codebook (so the oracle reproduces the index
    bit-for-bit).  A corpus lacking any of them no longer yields a
    silently empty top-k (VERDICT r5 item 3): the ivf_topk lazy
    assert_true-count guard rides the returned plan — a 0-row union
    branch forcing a 64-row codebook-count check at execution, no
    extra Spark job — and raises on a missing/partial codebook."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _pq_subspaces(
        emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") <= 17))
    ).select(F.col("vec_id").alias("cid"), "s", F.col("sub").alias("ce"))
    expected = _PQ_SUBS * 8  # 8 seed vectors x 8 subspace slices each
    ncent = cents.agg(F.count(F.lit(1)).cast("int").alias("_ncent"))
    guard = (
        ncent.select(
            F.assert_true(
                F.col("_ncent") == expected,
                F.concat(
                    F.lit("PQ codebook has "),
                    F.col("_ncent").cast("string"),
                    F.lit(
                        f" subspace entries, expected {expected} — the "
                        "corpus lacks (some of) the seed vec_ids 10..17; "
                        "refusing to ADC-scan against a broken codebook"
                    ),
                ),
            ).alias("_a")
        )
        # always-false predicate whose evaluation forces _a (see the
        # ivf_topk guard for the constant-folding caveat + tripwire).
        # The output columns are cast FROM _a (always-null but
        # non-foldable) rather than lit(None): callers join this union
        # on vec_id, and the pushed-down isnotnull(vec_id) filter would
        # constant-fold a literal-null branch — assert_true and all —
        # clean out of the plan (round-6 lesson; the pytest below is
        # the tripwire).
        .where(F.col("_a").isNotNull())
        .select(
            F.col("_a").cast("long").alias("vec_id"),
            F.col("_a").cast("bigint").alias("adc_dist"),
        )
    )
    corp = _pq_subspaces(emb.where(F.col("vec_id") != 0))
    scored = corp.join(F.broadcast(cents), "s").select(
        "vec_id",
        "s",
        "cid",
        _l2q(F.col("sub"), F.col("ce")).alias("d"),
    )
    codes = (
        scored.groupBy("vec_id", "s")
        .agg(
            F.max(
                F.struct(
                    (-F.col("d")).alias("nd"), (-F.col("cid")).alias("ncid")
                )
            ).alias("m")
        )
        .select("vec_id", "s", (-F.col("m.ncid")).alias("code"))
    )
    qtable = (
        _pq_subspaces(emb.where(F.col("vec_id") == 0))
        .join(F.broadcast(cents), "s")
        .select(
            F.col("s").alias("qs"),
            F.col("cid").alias("qcid"),
            _l2q(F.col("sub"), F.col("ce")).alias("qd"),
        )
    )
    return (
        codes.join(
            F.broadcast(qtable),
            (F.col("s") == F.col("qs")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd").cast("bigint").alias("adc_dist"))
        .unionByName(guard)
    )


_PQ_SHORTLIST = 100


def _pq_shortlist_sql() -> str:
    """The encode/table CTE chain ending in an ADC-ranked shortlist."""
    return f"""
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    cent AS (
      SELECT vec_id AS cid, s, i, x FROM sub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    corp AS (SELECT vec_id, s, i, x FROM sub WHERE vec_id <> 0),
    dists AS (
      SELECT corp.vec_id, corp.s, cent.cid,
             SUM(CAST(FLOOR((corp.x - cent.x) * (corp.x - cent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM corp JOIN cent ON corp.i = cent.i AND corp.s = cent.s
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    qtable AS (
      SELECT cent.s, cent.cid,
             SUM(CAST(FLOOR((qf.x - cent.x) * (qf.x - cent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM sub WHERE vec_id = 0) qf
      JOIN cent ON cent.i = qf.i AND cent.s = qf.s
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT c.vec_id FROM codes c
      JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
      ORDER BY SUM(t.qd) ASC, c.vec_id ASC
      LIMIT {_PQ_SHORTLIST}
    )"""


@register(
    "ann_pq_rerank_topk",
    f"""
    WITH {_pq_shortlist_sql()},
    rerank AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR((cf.x - qf.x) * (cf.x - qf.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS BIGINT)
               AS l2_dist
      FROM flat cf
      JOIN (SELECT i, x FROM flat WHERE vec_id = 0) qf ON cf.i = qf.i
      WHERE cf.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT r.vec_id, e.label, r.l2_dist
    FROM rerank r JOIN embeddings e ON e.vec_id = r.vec_id
    ORDER BY r.l2_dist ASC, r.vec_id ASC
    LIMIT 10
    """,
    description="the production PQ pipeline: ADC scan produces a "
    f"{_PQ_SHORTLIST}-candidate shortlist from the 8-byte codes, then "
    "exact quantized-L2 reranks ONLY the shortlist — full vectors are "
    "fetched for 100 candidates instead of the whole corpus, the "
    "standard two-stage recall/bandwidth trade (measured 6x the pure-"
    "ADC recall on this corpus; the dial is hash-checked in "
    "ann_pq_recall_report).  Exact BIGINT end to end",
    tags=("similarity", "ann", "pq", "rerank", "extension"),
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    shortlist = (
        _pq_adc_scores(spark, sf_dir)
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(_PQ_SHORTLIST)
        .select("vec_id")
    )
    return (
        emb.join(shortlist, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            _l2q(F.col("embedding"), F.col("qe")).alias("l2_dist"),
        )
        .orderBy(F.asc("l2_dist"), F.asc("vec_id"))
        .limit(10)
    )


def _pq_recall_oracle() -> str:
    from .registry import QUERIES

    pq = _pq_oracle()
    rerank = QUERIES["ann_pq_rerank_topk"].oracle
    return f"""
    WITH pq AS (SELECT vec_id FROM ({pq})),
    rr AS (SELECT vec_id FROM ({rerank})),
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    exact AS (
      SELECT cf.vec_id,
             SUM(CAST(FLOOR((cf.x - qf.x) * (cf.x - qf.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM flat cf
      JOIN (SELECT i, x FROM flat WHERE vec_id = 0) qf ON cf.i = qf.i
      WHERE cf.vec_id <> 0
      GROUP BY 1
      ORDER BY d ASC, cf.vec_id ASC
      LIMIT 10
    )
    SELECT 'pq_adc' AS method, CAST(10 AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           (CAST(COUNT(*) AS DOUBLE) / 10.0) AS recall_at_10
    FROM pq JOIN exact USING (vec_id)
    UNION ALL
    SELECT 'pq_adc_rerank{_PQ_SHORTLIST}' AS method,
           CAST(10 AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           (CAST(COUNT(*) AS DOUBLE) / 10.0) AS recall_at_10
    FROM rr JOIN exact USING (vec_id)
    """


@register(
    "ann_pq_recall_report",
    _pq_recall_oracle(),
    description="recall@10 of BOTH PQ stages against the EXACT "
    "quantized-L2 top-10 (the apples-to-apples ground truth for a "
    "distance-approximating index — unlike lsh/ivf, whose dial is "
    "cosine recall in ann_recall_report): the pure 8-byte-code ADC "
    "top-10 AND the ADC-shortlist+exact-rerank top-10, so the "
    "two-stage recall/bandwidth trade is itself a hash-checked row.  "
    "Same sandwich philosophy as the sketch queries",
    tags=("similarity", "ann", "pq", "recall", "extension"),
)
def ann_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    q = _query_vec(spark, sf_dir)
    exact = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "vec_id", _l2q(F.col("embedding"), F.col("qe")).alias("d")
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id")
    )

    def report(topk: DataFrame, label: str) -> DataFrame:
        return (
            topk.select("vec_id")
            .join(exact, "vec_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
            .select(
                F.lit(label).alias("method"),
                F.lit(10).cast("int").alias("k"),
                "n_hits",
                (F.col("n_hits").cast("double") / F.lit(10.0)).alias(
                    "recall_at_10"
                ),
            )
        )

    return report(ann_pq_adc_topk(spark, sf_dir), "pq_adc").unionAll(
        report(
            ann_pq_rerank_topk(spark, sf_dir),
            f"pq_adc_rerank{_PQ_SHORTLIST}",
        )
    )


@register(
    "semantic_cluster_diversity_sample",
    f"""
    WITH {_FLAT},
    cent AS (SELECT vec_id AS cid, i, x FROM flat
             WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, cent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * cent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN cent ON corp.i = cent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    )
    SELECT list_id, vec_id, label FROM (
      SELECT a.list_id, a.vec_id, e.label,
             ROW_NUMBER() OVER (PARTITION BY a.list_id
                                ORDER BY md5(CAST(a.vec_id AS VARCHAR)) ASC,
                                         a.vec_id ASC) AS rn
      FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
    ) WHERE rn <= 25
    """,
    description="semantic-cluster diversity sample (the SemDeDup-family "
    "selection shape): assign every embedding to its nearest coarse "
    "centroid (broadcast-k map + argmax agg, the IVF quantizer reused "
    "as a clusterer) and draw exactly 25 vectors per SEMANTIC cluster "
    "by hash order — caps any over-represented semantic region "
    "regardless of its raw frequency, where label_balanced_sample can "
    "only balance on explicit labels.  One shuffle on the cluster "
    "key; cluster count is the broadcast-side constant",
    tags=("similarity", "sampling", "clustering", "extension"),
)
def semantic_cluster_diversity_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import ivf_assign, ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    assign = ivf_assign(corpus, ivf_centroids(emb))
    w = Window.partitionBy("list_id").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
    )
    return (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .select("list_id", "vec_id", "label")
    )


# --- persisted PQ/IVF ANN index (round 6: build once, probe many) -----


def _pq_persisted_oracle(
    probed: bool,
    corpus_pred: str = "vec_id <> 0",
    emb_update: str | None = None,
) -> str:
    """DuckDB replay of the persisted index probe: PQ encode (what
    build_pq_index stored) + IVF assignment (the stored list_id) + ADC
    against the stored codes — optionally restricted to the query's 2
    nearest coarse lists (the partition-pruned probe).

    ``emb_update``: SQL expression over ``(vec_id, embedding)``
    replacing the embedding column the flat CTE reads — the
    upsert-sim oracle replays the FINAL vector versions (it must
    leave vec_id 0 and the 10-17 seed-centroid rows untouched, or it
    would be replaying a different quantizer).  Default emits
    byte-identical SQL to the pre-parameter generator."""
    probes_cte = (
        f""",
    qdots AS (
      SELECT icent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN icent ON qf.i = icent.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    ),
    probes AS (
      SELECT q.cid FROM qdots q
      JOIN norms nq ON nq.vec_id = 0
      JOIN norms nc ON nc.vec_id = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC, q.cid ASC
      LIMIT 2
    )"""
        if probed
        else ""
    )
    where = (
        "WHERE g.list_id IN (SELECT cid FROM probes)" if probed else ""
    )
    pre = ""
    flat_block = _FLAT
    if emb_update is not None:
        pre = (
            "emb_upd AS (\n"
            f"      SELECT vec_id, {emb_update} AS embedding\n"
            "      FROM embeddings\n    ),"
        )
        flat_block = _FLAT.replace("FROM embeddings", "FROM emb_upd")
    return f"""
    WITH {pre}{flat_block},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE {corpus_pred}),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    qtable AS (
      SELECT pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psub WHERE vec_id = 0) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE {corpus_pred}),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    acos AS (
      SELECT a.vec_id, a.cid,
             (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) AS ccos
      FROM adots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.cid
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    ){probes_cte}
    SELECT a.vec_id, e.label, CAST(g.list_id AS BIGINT) AS list_id,
           a.adc_dist
    FROM adc a
    JOIN assign g ON g.vec_id = a.vec_id
    JOIN embeddings e ON e.vec_id = a.vec_id
    {where}
    ORDER BY a.adc_dist ASC, a.vec_id ASC
    LIMIT 10
    """


def _pq_persisted_fitted_oracle(
    n_iters: int = _IVF_FIT_ITERS, emb_update: str | None = None
) -> str:
    """DuckDB replay of the FITTED persisted index (VERDICT r6 item 3):
    the Lloyd chain (:func:`_fitted_centroid_ctes`) reproduces the
    k-means coarse quantizer bit-for-bit, the PQ CTEs reproduce the
    stored codes (seed codebook — the PQ sub-quantizer stays the
    deterministic artifact), and the probe tail restricts the ADC scan
    to the query's 2 nearest FITTED lists — exactly what
    ``build_pq_index(centroids=ivf_fit_centroids(...))`` persisted and
    ``pq_probe_topk(nprobe=2)`` scans.

    ``emb_update`` substitutes the embedding relation the WHOLE chain
    (fit + encode + probe) reads — the refit-sim oracle (round 11):
    after ``refit_index`` every artifact derives from the CURRENT
    corpus, so the replay is simply the fitted build over the final
    vector versions."""
    ctes, fin, prev = _fitted_centroid_ctes(n_iters)
    if emb_update is not None:
        pre = (
            "emb_upd AS (\n"
            f"      SELECT vec_id, {emb_update} AS embedding\n"
            "      FROM embeddings\n    )"
        )
        ctes[0] = ctes[0].replace("FROM embeddings", "FROM emb_upd")
        ctes.insert(0, pre)
    ctes.append(
        f"""psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    )"""
    )
    ctes.append(
        """pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    )"""
    )
    ctes.append(
        "pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0)"
    )
    ctes.append(
        f"""pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    )"""
    )
    ctes.append(
        """pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""qtable AS (
      SELECT pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psub WHERE vec_id = 0) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        """adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
    )"""
    )
    ctes.append(
        f"""qd AS (
      SELECT c.cid,
             CAST(SUM(CAST(FLOOR(qf.x * c.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN {prev} c ON qf.i = c.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT q.cid FROM qd q
      JOIN norms nq ON nq.vec_id = 0
      JOIN cn{fin} cn ON cn.cid = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(cn.n2))) DESC, q.cid ASC
      LIMIT 2
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT a.vec_id, e.label, CAST(g.list_id AS BIGINT) AS list_id,
           a.adc_dist
    FROM adc a
    JOIN asg{fin} g ON g.vec_id = a.vec_id
    JOIN embeddings e ON e.vec_id = a.vec_id
    WHERE g.list_id IN (SELECT cid FROM probes)
    ORDER BY a.adc_dist ASC, a.vec_id ASC
    LIMIT 10
    """


_PQ_INDEX_CACHE: dict[str, str] = {}


def _ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the persisted index ONCE per (process, sf_dir) into a
    temp dir; the registered probes then read only the stored artifact
    — build amortized over all probes, the 100 TB shape (in production
    the path is a warehouse location and the build is a scheduled
    job)."""
    key = dataset_cache_key(sf_dir)
    path = _PQ_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        from ..operators.ann_index import build_pq_index

        path = tempfile.mkdtemp(prefix="pq_index_")
        build_pq_index(spark, load_table(spark, sf_dir, "embeddings"), path)
        _PQ_INDEX_CACHE[key] = path
    return path


def _probe_with_labels(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    nprobe: int | None,
    upto_batch_id: int | None = None,
) -> DataFrame:
    from ..operators.ann_index import pq_probe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_probe_topk(
        spark, path, q, 10, nprobe=nprobe, upto_batch_id=upto_batch_id
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            # list_id comes back as the partition column's inferred
            # int; restore the stored long for oracle dtype parity
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_pq_persisted_topk",
    _pq_persisted_oracle(probed=False),
    description="PQ/ADC top-10 probing the PERSISTED index (VERDICT r5 "
    "item 2): build_pq_index writes codes (8 bytes/vector, partitioned "
    "by batch generation + IVF list), codebook (64 rows) and coarse "
    "centroids once; the probe plan scans ONLY those stored tables — "
    "broadcast 64-entry query distance table against the code scan, no "
    "encode subtree, no embedding access beyond the 1-row query vector "
    "and the label join (plan pinned by pytest).  The oracle replays "
    "the stored encode+assignment bit-for-bit, proving the artifact "
    "equals the in-plan encode of ann_pq_adc_topk",
    tags=("similarity", "ann", "pq", "index", "extension"),
)
def ann_pq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_pq_index(spark, sf_dir)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


@register(
    "ann_ivfpq_persisted_topk",
    _pq_persisted_oracle(probed=True),
    description="IVF-PQ: the composed production index — the query "
    "ranks the 8 stored coarse centroids (broadcast), probes its 2 "
    "nearest lists, and ADC-scans only THOSE lists' stored codes; "
    "list_id is a partition column of the codes table, so the probe "
    "is literal partition pruning on the index scan (~nprobe/k_lists "
    "of the codes), on top of PQ's 8-bytes-per-vector — the standard "
    "billion-scale ANN memory/scan budget.  Recall < 1 by design "
    "(both the coarse probe and the code quantization approximate)",
    tags=("similarity", "ann", "pq", "ivf", "index", "extension"),
)
def ann_ivfpq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_pq_index(spark, sf_dir)
    return _probe_with_labels(spark, sf_dir, path, nprobe=2)


_PQ_ATTRS_BUILT: set[str] = set()


def _ensure_pq_attrs(spark: SparkSession, sf_dir: str) -> str:
    """Attach the filterable-attribute side store to the cached
    persisted index, once per (process, sf_dir) — build_attr_store
    copies the codes table's (batch_id, list_id) layout so filtered
    probes prune both relations identically.  Carries the embedding's
    own ``label`` plus the owning document's ``lang`` (doc i's
    embedding is vector i — the multimodal corpus contract), so both
    the label-filtered ANN probe and the lang-filtered hybrid share
    one store."""
    from ..operators.ann_index import build_attr_store

    path = _ensure_pq_index(spark, sf_dir)
    if path not in _PQ_ATTRS_BUILT:
        emb = load_table(spark, sf_dir, "embeddings")
        docs = load_table(spark, sf_dir, "documents")
        build_attr_store(
            spark,
            emb.select("vec_id", "label").join(
                docs.select(
                    F.col("doc_id").alias("vec_id"), "lang"
                ),
                "vec_id",
            ),
            path,
        )
        _PQ_ATTRS_BUILT.add(path)
    return path


@register(
    "ann_pq_filtered_topk",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id IN "
        "(SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
    ),
    description="FILTERED vector search over the persisted IVF-PQ "
    "index — predicate + nearest-neighbor, the retrieval-stack "
    "staple (RAG 'within lang=en', labeled-split mining): top-10 by "
    "ADC among stored vectors with label IN (1,3,5), probing the "
    "query's 2 nearest coarse lists.  The filterable attribute lives "
    "in a side store written in the SAME (batch_id, list_id) "
    "partition layout as the codes (operators/ann_index."
    "build_attr_store — the codes-side twin of BM25's denormalized "
    "dl), so the probe prunes codes AND attrs to the probed lists, "
    "pushes the label predicate into the pruned attrs scan, and "
    "restricts codes via a list-local semi join — no corpus-wide "
    "metadata join at serve time, cost stays ~ touched lists at any "
    "selectivity.  Coarse-list selection deliberately IGNORES the "
    "filter (the standard filtered-IVF contract, replayed by the "
    "oracle): a matching vector in an unprobed list is an nprobe-"
    "dialable recall miss, exactly as in unfiltered IVF",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "extension"),
)
def ann_pq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_index import pq_filtered_topk

    path = _ensure_pq_attrs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_filtered_topk(
        spark, path, q, 10,
        F.col("label").isin(1, 3, 5), nprobe=2,
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


_DRIFT_CHURN_SQL = (
    "CASE WHEN vec_id % 10 = 4 AND vec_id > 20 "
    "THEN list_transform(embedding, x -> x * 0.5 + 0.25) "
    "ELSE embedding END"
)


def _recall_after_churn_oracle(n_iters: int = _IVF_FIT_ITERS) -> str:
    """DuckDB replay of the quantizer-drift report: TWO fitted-index
    chains in one query (the suffix-parameterized Lloyd generator) —
    the STALE index fits on the ORIGINAL corpus but encodes the
    post-churn values against those frozen artifacts (exactly the
    state build + upsert_vectors leaves), the FRESH twin fits and
    encodes on the current corpus — each probed nprobe=2, each top-10
    intersected with the ground truth.

    Ground truth is the EXHAUSTIVE full-ADC top-10: the PQ seed
    codebook and the query row are untouched by the churn (one
    pcent/qtable pair serves both chains), so both variants' code
    arrays are identical and the full scan ranks them identically —
    recall@10 against it isolates exactly the COARSE quantizer, the
    artifact that drifts (exact-L2 truth would bury the signal under
    the shared PQ quantization error — measured: 0/0 hits).  The
    churn transform (halve + 0.25, both exact in binary FP) changes
    vector DIRECTIONS, so the Lloyd fit genuinely moves — a
    scale-only churn is invisible to the cosine assignment."""
    churn = _DRIFT_CHURN_SQL
    sctes, fin, prev_s = _fitted_chain_ctes(
        n_iters, sfx="s", fit_flat="flat", fit_norms="norms",
        enc_flat="flatu", enc_norms="normsu",
    )
    fctes, _fin2, prev_f = _fitted_chain_ctes(
        n_iters, sfx="f", fit_flat="flatu", fit_norms="normsu",
    )
    probe_tail = []
    for sfx, prev in (("s", prev_s), ("f", prev_f)):
        probe_tail.append(
            f"""qd{sfx} AS (
      SELECT c.cid,
             CAST(SUM(CAST(FLOOR(qf.x * c.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN {prev} c ON qf.i = c.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    )"""
        )
        probe_tail.append(
            f"""probes{sfx} AS (
      SELECT q.cid FROM qd{sfx} q
      JOIN norms nq ON nq.vec_id = 0
      JOIN cn{fin}{sfx} cn ON cn.cid = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(cn.n2))) DESC, q.cid ASC
      LIMIT 2
    )"""
        )
        probe_tail.append(
            f"""adc{sfx} AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c
      JOIN asg{fin}{sfx} g ON g.vec_id = c.vec_id
      JOIN qtable t ON t.s = c.s AND t.cid = c.code
      WHERE g.list_id IN (SELECT cid FROM probes{sfx})
      GROUP BY 1
    )"""
        )
        probe_tail.append(
            f"""vrank{sfx} AS (
      SELECT vec_id FROM adc{sfx}
      ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
    )"""
        )
    body = ",\n    ".join(
        [
            f"""emb_upd AS (
      SELECT vec_id, {churn} AS embedding FROM embeddings
    )""",
            _FLAT.strip(),
            f"""flatu AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM emb_upd
    )""",
            f"""normsu AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flatu GROUP BY vec_id
    )""",
            *sctes,
            *fctes,
            # PQ encode of the CURRENT corpus against the (churn-
            # invariant) seed codebook — shared by both chains
            f"""psubu AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flatu
    )""",
            """pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psubu
      WHERE vec_id BETWEEN 10 AND 17
    )""",
            "pcorpu AS (SELECT vec_id, s, i, x FROM psubu "
            "WHERE vec_id <> 0)",
            f"""pdists AS (
      SELECT pcorpu.vec_id, pcorpu.s, pcent.cid,
             SUM(CAST(FLOOR((pcorpu.x - pcent.x) * (pcorpu.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorpu JOIN pcent ON pcent.i = pcorpu.i AND pcent.s = pcorpu.s
      GROUP BY 1, 2, 3
    )""",
            """pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    )""",
            f"""qtable AS (
      SELECT pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psubu WHERE vec_id = 0) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2
    )""",
            *probe_tail,
            """truth AS (
      SELECT vec_id FROM (
        SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
        FROM pcodes c
        JOIN qtable t ON t.s = c.s AND t.cid = c.code
        GROUP BY c.vec_id
      ) ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
    )""",
        ]
    )
    return f"""
    WITH {body}
    SELECT v.variant,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM vrankf
            WHERE vec_id IN (SELECT vec_id FROM truth)) * (
              CASE WHEN v.variant = 'fresh_fit' THEN 1 ELSE 0 END)
           + (SELECT CAST(COUNT(*) AS BIGINT) FROM vranks
              WHERE vec_id IN (SELECT vec_id FROM truth)) * (
              CASE WHEN v.variant = 'stale_fit' THEN 1 ELSE 0 END)
           AS n_hits
    FROM (VALUES ('fresh_fit'), ('stale_fit')) v(variant)
    ORDER BY v.variant
    """


_PQ_FITTED_INDEX_CACHE: dict[str, str] = {}


def _ensure_fitted_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the FITTED persisted index once per (process, sf_dir):
    Lloyd-fit the coarse quantizer over the corpus, persist codes +
    codebook + fitted centroids, probe only the stored artifact — the
    production shape end to end (fit -> persist -> probe)."""
    key = dataset_cache_key(sf_dir)
    path = _PQ_FITTED_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        from ..operators.ann_index import build_pq_index
        from ..operators.similarity import ivf_fit_centroids

        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.where(F.col("vec_id") != 0)
        path = tempfile.mkdtemp(prefix="pq_index_fitted_")
        build_pq_index(
            spark,
            emb,
            path,
            centroids=ivf_fit_centroids(corpus, n_iters=_IVF_FIT_ITERS),
        )
        _PQ_FITTED_INDEX_CACHE[key] = path
    return path


@register(
    "ann_pq_persisted_fitted_topk",
    _pq_persisted_fitted_oracle(),
    description="the PRODUCTION index wiring end to end (VERDICT r6 "
    "item 3, the last gap between the registered index and the real "
    "one): a k-means-FITTED coarse quantizer (2 deterministic Lloyd "
    "iterations, integer-exact means) is persisted INTO the index via "
    "build_pq_index(centroids=...), the corpus is encoded and "
    "IVF-assigned against the fitted artifact, and the probe "
    "partition-prunes the stored codes to the query's 2 nearest "
    "fitted lists — fit -> persist -> probe, all from stored tables, "
    "no fit or encode subtree in the probe plan.  The oracle replays "
    "the entire Lloyd fit + PQ encode + fitted assignment + coarse "
    "ranking bit-for-bit, so the driver hash pins the fitted "
    "artifact itself",
    tags=("similarity", "ann", "pq", "ivf", "index", "extension"),
)
def ann_pq_persisted_fitted_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _ensure_fitted_pq_index(spark, sf_dir)
    return _probe_with_labels(spark, sf_dir, path, nprobe=2)


@register(
    "ann_index_delete_sim",
    _pq_persisted_oracle(
        probed=False, corpus_pred="vec_id <> 0 AND vec_id % 2 = 0"
    ),
    description="right-to-erasure on the persisted ANN index "
    "(streaming/ann_ingest.delete_vectors, the text delete_docs "
    "twin): the index is built over ALL vectors, the odd vec_ids are "
    "erased — only the (generation, list) partitions containing them "
    "rewrite, emptied partitions removed outright, quantizer "
    "artifacts untouched — and the full-ADC probe must equal an index "
    "that never contained them (the oracle replays encode + "
    "assignment + ADC over the surviving evens only).  No stats "
    "rebuild is needed on this side: ADC scoring carries no corpus "
    "statistics",
    tags=("similarity", "ann", "pq", "index", "maintenance",
          "extension"),
)
def ann_index_delete_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.ann_ingest import delete_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_del_")
    build_pq_index(spark, emb, path)
    odd_ids = [
        r["vec_id"]
        for r in emb.where(F.col("vec_id") % 2 == 1)
        .select("vec_id")
        .collect()
    ]
    delete_vectors(spark, path, odd_ids)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


_VEC_UPSERT_SQL = (
    "CASE WHEN vec_id % 10 = 4 AND vec_id > 20 "
    "THEN list_transform(embedding, x -> x * 0.5) "
    "ELSE embedding END"
)


@register(
    "ann_index_upsert_sim",
    _pq_persisted_oracle(probed=False, emb_update=_VEC_UPSERT_SQL),
    description="UPDATE on the persisted ANN index "
    "(streaming/ann_ingest.upsert_vectors — the text upsert's far "
    "simpler twin: ADC carries no corpus statistics, so membership "
    "IS the state; no corrections, tombstones or markers): the index "
    "is built over ALL vectors, then the vec_id % 10 = 4 vectors "
    "(> 20, leaving the query row and seed-centroid rows untouched) "
    "are re-sent HALVED — old code rows physically erased from every "
    "(generation, list) partition they occupy, new values re-encoded "
    "against the STORED quantizer and appended under their own "
    "generation, replay converging by partition overwrite.  The "
    "full-ADC probe must equal an index built from the FINAL vector "
    "versions: the oracle re-runs the whole encode/assign replay "
    "over the halved embeddings (halving is exact in binary "
    "floating point, so both engines see bit-identical inputs), "
    "proving the old codes left no trace and the new values "
    "quantize exactly",
    tags=("similarity", "ann", "pq", "index", "maintenance",
          "extension"),
)
def ann_index_upsert_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.ann_ingest import upsert_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_upsert_")
    build_pq_index(spark, emb, path)
    revised = emb.where(
        (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
    ).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * F.lit(0.5)
        ).alias("embedding"),
    )
    upsert_vectors(spark, path, revised, batch_id=1)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


@register(
    "ann_index_ingest_sim",
    _pq_persisted_oracle(probed=False),
    description="incremental ANN index ingestion simulated as a batch "
    "plan (VERDICT r5 item 5, the incremental_dedup_sim pattern): the "
    "static build indexes only EVEN vec_ids, then the streaming "
    "ingest sink (streaming/ann_ingest.py) encodes the ODD vec_ids "
    "against the stored quantizer as micro-batch 1 — appended "
    "batch_id-keyed and replay-safe — and a full-ADC probe of the "
    "resulting two-generation index must equal the all-at-once oracle "
    "exactly (encoding is per-vector, so ingest batching must be "
    "invisible). Hash-grade evidence for the ingest encoder beyond "
    "its streaming pytest",
    tags=("similarity", "ann", "pq", "index", "streaming", "extension"),
)
def ann_index_ingest_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.ann_ingest import streaming_ann_index_sink

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_ingest_")
    build_pq_index(
        spark,
        emb,
        path,
        corpus=emb.where(
            (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
        ),
    )
    sink = streaming_ann_index_sink(path)
    sink(emb.where(F.col("vec_id") % 2 == 1), 1)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


@register(
    "ann_filtered_live_sim",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id IN "
        "(SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
        emb_update=_VEC_UPSERT_SQL,
    ),
    description="FILTERED search on a LIVE index — the composition "
    "round 9 left as design debt (VERDICT r9 item 2: the attr store "
    "was rebuild-only, so filtered search and streaming ingest were "
    "operationally exclusive): the index + attr store are built over "
    "the EVEN vec_ids only, the odds stream in through the ingest "
    "sink WITH their label column (the batch's attrs rows ride the "
    "same call into the same (batch_id, list_id) partitions as its "
    "codes — delta-shaped, no corpus-length build_attr_store rerun), "
    "then the vec_id % 10 = 4 (> 20) vectors are UPSERTED halved "
    "(their attrs rewrite alongside their re-encoded codes), and the "
    "filtered probe (label IN (1,3,5), nprobe=2) runs directly — no "
    "rebuild anywhere after the initial bootstrap.  The oracle "
    "replays encode/assign/ADC over the FINAL embeddings restricted "
    "to the labeled subset, so the hash proves the three maintenance "
    "paths kept attrs exactly co-complete with codes; the probe-time "
    "coverage guard (tripwire for out-of-band writes) stays in the "
    "plan at list-local cost",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "streaming", "maintenance", "extension"),
)
def ann_filtered_live_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_filtered_topk,
    )
    from ..streaming.ann_ingest import (
        streaming_ann_index_sink,
        upsert_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_filt_live_")
    evens = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
    )
    build_pq_index(spark, emb, path, corpus=evens)
    build_attr_store(spark, evens.select("vec_id", "label"), path)
    streaming_ann_index_sink(path)(
        emb.where(F.col("vec_id") % 2 == 1).select(
            "vec_id", "embedding", "label"
        ),
        1,
    )
    revised = emb.where(
        (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias(
            "embedding"
        ),
        "label",
    )
    upsert_vectors(spark, path, revised, batch_id=2)
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_filtered_topk(
        spark, path, q, 10, F.col("label").isin(1, 3, 5), nprobe=2
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_filtered_asof_sim",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id % 2 = 0 AND vec_id IN "
        "(SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
    ),
    description="FILTERED search composed with AS-OF time travel "
    "(round 11): 'rank within label IN (1,3,5) exactly as the index "
    "stood after the build' — the reproducible-filtered-retrieval "
    "shape a training run pins.  The index + attr store are built "
    "over the EVEN vec_ids, the odds stream in (attrs riding, "
    "generation 1), and the filtered probe runs with "
    "upto_batch_id=0: the watermark partition-prunes BOTH the codes "
    "and the attrs scans (attrs ride the same batch_id generations, "
    "so one committed prefix covers both), and the result must equal "
    "the filtered probe over an index that never ingested the odds — "
    "the oracle restricts the replay to even, labeled vectors within "
    "the probed lists.  The upsert/refit marker guard composes: a "
    "watermark below rewritten history refuses (pytest)",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "asof", "extension"),
)
def ann_filtered_asof_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_filtered_topk,
    )
    from ..streaming.ann_ingest import streaming_ann_index_sink

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_filt_asof_")
    evens = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
    )
    build_pq_index(spark, emb, path, corpus=evens)
    build_attr_store(spark, evens.select("vec_id", "label"), path)
    streaming_ann_index_sink(path)(
        emb.where(F.col("vec_id") % 2 == 1).select(
            "vec_id", "embedding", "label"
        ),
        1,
    )
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_filtered_topk(
        spark,
        path,
        q,
        10,
        F.col("label").isin(1, 3, 5),
        nprobe=2,
        upto_batch_id=0,
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_attr_evolve_sim",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id % 7 IN (2, 5) AND vec_id "
        "IN (SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
    ),
    description="ATTR-SCHEMA EVOLUTION on a live filtered index "
    "(VERDICT r11 item 4: the attr column set was frozen at "
    "build/first-ingest — a new filter dimension needed a full "
    "build_attr_store rerun, a corpus-length codes join): the index "
    "+ attr store (label only) are built over the EVEN vec_ids, the "
    "odds stream in with their label (generation 1), then "
    "add_attr_column backfills a NEW grp = vec_id % 7 column — one "
    "pass over the narrow attrs store joined to the supplied values, "
    "codes and embeddings never read, installed by the checked "
    "atomic-rename swap with an as-of marker landing first — and the "
    "filtered probe composes OLD and NEW columns (label IN (1,3,5) "
    "AND grp IN (2,5), nprobe=2) with no probe-side changes.  The "
    "oracle replays encode/assign/ADC restricted by the same "
    "composed predicate, so the hash proves the widened store is "
    "exactly co-complete with the codes across both the built and "
    "the ingested generations",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "maintenance", "evolution", "extension"),
)
def ann_attr_evolve_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_filtered_topk,
    )
    from ..streaming.ann_ingest import (
        add_attr_column,
        streaming_ann_index_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_attr_evolve_")
    evens = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
    )
    build_pq_index(spark, emb, path, corpus=evens)
    build_attr_store(spark, evens.select("vec_id", "label"), path)
    streaming_ann_index_sink(path)(
        emb.where(F.col("vec_id") % 2 == 1).select(
            "vec_id", "embedding", "label"
        ),
        1,
    )
    add_attr_column(
        spark,
        path,
        emb.select(
            "vec_id", (F.col("vec_id") % 7).alias("grp")
        ),
        batch_id=2,
    )
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_filtered_topk(
        spark,
        path,
        q,
        10,
        F.col("label").isin(1, 3, 5) & F.col("grp").isin(2, 5),
        nprobe=2,
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_filtered_soak_sim",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id IN "
        "(SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
        emb_update=_VEC_UPSERT_SQL,
    ),
    description="STREAMING FILTERED SERVING SOAK (VERDICT r11 item "
    "8): ann_filtered_live_sim proves ONE ingest→filtered-probe "
    "cycle; this sim pins the delta-maintained attr store under "
    "sustained churn — two ingest triggers land the odd vec_ids in "
    "separate generations (vec_id % 4 = 1 as generation 1, % 4 = 3 "
    "as generation 2, attrs riding each), a filtered probe is SERVED "
    "BETWEEN triggers (evaluated, k rows demanded — the live-serving "
    "interleave), trigger 1 is then REPLAYED whole (the crash-replay "
    "path: dynamic partition overwrite must converge, not duplicate), "
    "and the % 10 = 4 (> 20) vectors are upserted halved (generation "
    "3).  The final filtered probe (label IN (1,3,5), nprobe=2) must "
    "equal the oracle's replay over the FINAL embeddings restricted "
    "to the labeled subset — any drift the churn sequence left in "
    "codes/attrs co-completeness breaks the hash",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "streaming", "maintenance", "soak", "extension"),
)
def ann_filtered_soak_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_filtered_topk,
    )
    from ..streaming.ann_ingest import (
        streaming_ann_index_sink,
        upsert_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_filt_soak_")
    evens = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
    )
    build_pq_index(spark, emb, path, corpus=evens)
    build_attr_store(spark, evens.select("vec_id", "label"), path)
    sink = streaming_ann_index_sink(path)
    gen1 = emb.where(F.col("vec_id") % 4 == 1).select(
        "vec_id", "embedding", "label"
    )
    sink(gen1, 1)
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    # mid-churn serving: the probe is EVALUATED here (k rows
    # demanded), exercising the coverage guard against the
    # half-ingested store — a missing attrs row raises now, not at
    # the end
    mid = pq_filtered_topk(
        spark, path, q, 5, F.col("label").isin(1, 3, 5), nprobe=2
    ).collect()
    if len(mid) != 5:
        raise RuntimeError(
            f"soak sim: mid-churn filtered probe returned {len(mid)} "
            "rows, expected 5"
        )
    sink(
        emb.where(F.col("vec_id") % 4 == 3).select(
            "vec_id", "embedding", "label"
        ),
        2,
    )
    sink(gen1, 1)  # trigger-1 REPLAY: must converge, not duplicate
    revised = emb.where(
        (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias(
            "embedding"
        ),
        "label",
    )
    upsert_vectors(spark, path, revised, batch_id=3)
    topk = pq_filtered_topk(
        spark, path, q, 10, F.col("label").isin(1, 3, 5), nprobe=2
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_list_split_sim",
    "SELECT vec_id, label, adc_dist FROM ("
    + _pq_persisted_oracle(probed=False)
    + ") ORDER BY adc_dist ASC, vec_id ASC",
    description="IVF LIST-SKEW MAINTENANCE (VERDICT r11 item 5): the "
    "hottest inverted list (computed from the stored codes — probe "
    "cost is ∝ touched lists, so one skewed list re-creates the "
    "linear-scan problem) is SPLIT into two by "
    "streaming/ann_ingest.split_list — a LIST-length op (2-centroid "
    "deterministic Lloyd over the members, codes copied unchanged, "
    "the centroids table swapped as the atomic commit under the "
    "list-manifest invariant) where the only previous remedy, "
    "refit_index, is CORPUS-length.  The exhaustive probe after the "
    "split must hash-equal the plain full-ADC oracle: PQ distances "
    "are list-independent, so any vector the split lost, duplicated, "
    "or left in the retired list breaks the match (the manifest "
    "semi-join hides retired/staged lists from every probe shape).  "
    "Routing quality (each member in its nearer new centroid's list) "
    "is pinned by pytest",
    tags=("similarity", "ann", "pq", "ivf", "index", "maintenance",
          "skew", "extension"),
)
def ann_list_split_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index, pq_probe_topk
    from ..streaming.ann_ingest import split_list

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_split_")
    build_pq_index(spark, emb, path)
    counts = (
        spark.read.parquet(f"{path}/codes")
        .groupBy("list_id")
        .count()
        .collect()
    )
    hot = max(counts, key=lambda r: (r["count"], -r["list_id"]))
    split_list(spark, path, int(hot["list_id"]), emb, batch_id=1)
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_probe_topk(spark, path, q, 10, nprobe=None)
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", "adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_list_merge_sim",
    "SELECT vec_id, label, adc_dist FROM ("
    + _pq_persisted_oracle(probed=False)
    + ") ORDER BY adc_dist ASC, vec_id ASC",
    description="IVF LIST-COUNT MAINTENANCE — split_list's inverse: "
    "the two COLDEST inverted lists (computed from the stored codes) "
    "are folded into one by streaming/ann_ingest.merge_lists, "
    "bounding the manifest size that every split grows (the coarse "
    "ranking broadcasts the manifest, and nprobe-vs-list-count recall "
    "semantics drift if it only ever grows).  Same LIST-length shape "
    "and commit protocol as the split: deterministic quantized-mean "
    "centroid, PQ codes copied unchanged, rows rewritten invisible "
    "under the list-manifest invariant, the centroid-table rename as "
    "the single atomic commit.  The exhaustive probe after the merge "
    "must hash-equal the plain full-ADC oracle — any vector lost, "
    "duplicated, or left in a retired list breaks the match; "
    "all-or-nothing id validation and the split/merge round-trip are "
    "pinned by pytest",
    tags=("similarity", "ann", "pq", "ivf", "index", "maintenance",
          "skew", "extension"),
)
def ann_list_merge_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index, pq_probe_topk
    from ..streaming.ann_ingest import merge_lists

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_merge_")
    build_pq_index(spark, emb, path)
    counts = (
        spark.read.parquet(f"{path}/codes")
        .groupBy("list_id")
        .count()
        .collect()
    )
    cold = sorted(counts, key=lambda r: (r["count"], r["list_id"]))[:2]
    merge_lists(
        spark, path, [int(r["list_id"]) for r in cold], emb, batch_id=1
    )
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_probe_topk(spark, path, q, 10, nprobe=None)
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", "adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


@register(
    "ann_attr_drop_sim",
    _pq_persisted_oracle(
        probed=True,
        corpus_pred="vec_id <> 0 AND vec_id IN "
        "(SELECT vec_id FROM embeddings WHERE label IN (1, 3, 5))",
    ),
    description="ATTR-SCHEMA RETIREMENT on the live filtered index — "
    "drop_attr_column, add_attr_column's inverse: the attr store is "
    "built with (label, grp = vec_id % 7), the grp dimension is then "
    "DROPPED (narrow-table stage + the shared checked atomic swap; "
    "codes never read; no as-of marker needed — remaining columns' "
    "history is untouched and a probe on the dropped column fails "
    "loudly rather than silently), and the filtered probe on the "
    "REMAINING label column must hash-equal the filtered oracle — "
    "proving the drop rewrote the store without corrupting the "
    "surviving dimension's values or coverage.  Replay/all-or-"
    "nothing/last-column refusals pinned by pytest",
    tags=("similarity", "ann", "pq", "ivf", "index", "filtered",
          "maintenance", "evolution", "extension"),
)
def ann_attr_drop_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_filtered_topk,
    )
    from ..streaming.ann_ingest import drop_attr_column

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_attr_drop_")
    build_pq_index(spark, emb, path)
    build_attr_store(
        spark,
        emb.where(F.col("vec_id") != 0).select(
            "vec_id", "label", (F.col("vec_id") % 7).alias("grp")
        ),
        path,
    )
    drop_attr_column(spark, path, ["grp"], batch_id=1)
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    topk = pq_filtered_topk(
        spark, path, q, 10, F.col("label").isin(1, 3, 5), nprobe=2
    )
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("list_id").cast("long").alias("list_id"),
            "adc_dist",
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    )


def _churned_emb(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(revised_slice, final_emb) under the shared churn
    (_VEC_UPSERT_SQL: vec_id % 10 = 4 and > 20, halved — seed rows and
    the query row untouched)."""
    revised = emb.where(
        (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias(
            "embedding"
        ),
    )
    final_emb = (
        emb.select("vec_id", "embedding")
        .join(revised.select("vec_id"), "vec_id", "left_anti")
        .unionByName(revised)
    )
    return revised, final_emb


@register(
    "ann_recall_after_churn",
    _recall_after_churn_oracle(),
    description="QUANTIZER DRIFT measured (VERDICT r9 item 7): after "
    "heavy churn (every vec_id % 10 = 4 vector > 20 upserted with a "
    "direction-changing exact-FP transform x*0.5+0.25), the report "
    "compares recall@10 — hits against the EXHAUSTIVE full-ADC top-10, "
    "which is identical across variants because the seed PQ codebook "
    "is churn-invariant, so the measurement isolates the COARSE "
    "quantizer, the artifact that drifts — of (a) the STALE index, "
    "whose Lloyd-fitted coarse quantizer froze at build time on the "
    "original corpus and whose upserted vectors were re-encoded "
    "against those stale artifacts, vs (b) a FRESH-FIT twin built on "
    "the current corpus.  Two full fitted-index replay chains run in "
    "the oracle (the suffix-parameterized Lloyd generator: "
    "fit-on-original + encode-current for the stale side, "
    "fit-and-encode-current for the fresh side), so the driver hash "
    "pins the drift measurement itself, not just that two numbers "
    "came out.  When the report shows decay, refit_index "
    "(ann_index_refit_sim) is the recovery",
    tags=("similarity", "ann", "pq", "ivf", "index", "maintenance",
          "report", "extension"),
)
def ann_recall_after_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index, pq_probe_topk
    from ..operators.similarity import ivf_fit_centroids
    from ..streaming.ann_ingest import upsert_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    revised = emb.where(
        (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
    ).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * F.lit(0.5) + F.lit(0.25)
        ).alias("embedding"),
    )
    final_emb = (
        emb.select("vec_id", "embedding")
        .join(revised.select("vec_id"), "vec_id", "left_anti")
        .unionByName(revised)
    )
    final_corpus = final_emb.where(F.col("vec_id") != 0)
    q = emb.where(F.col("vec_id") == 0).select("embedding")

    stale = tempfile.mkdtemp(prefix="pq_index_stale_")
    build_pq_index(
        spark,
        emb,
        stale,
        centroids=ivf_fit_centroids(
            emb.where(F.col("vec_id") != 0), n_iters=_IVF_FIT_ITERS
        ),
    )
    upsert_vectors(spark, stale, revised, batch_id=1)

    fresh = tempfile.mkdtemp(prefix="pq_index_fresh_")
    build_pq_index(
        spark,
        final_emb,
        fresh,
        corpus=final_corpus,
        centroids=ivf_fit_centroids(final_corpus, n_iters=_IVF_FIT_ITERS),
    )

    # ground truth: the exhaustive full-ADC ranking (identical on both
    # stores — same codes, same codebook; only list assignments differ)
    truth = (
        pq_probe_topk(spark, fresh, q, 10, nprobe=None).select("vec_id")
    )
    variants = (
        ("fresh_fit", fresh),
        ("stale_fit", stale),
    )
    parts = [
        pq_probe_topk(spark, path, q, 10, nprobe=2)
        .select("vec_id")
        .join(truth, "vec_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        .select(F.lit(name).alias("variant"), "n_hits")
        for name, path in variants
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("variant")


@register(
    "ann_index_refit_sim",
    _pq_persisted_fitted_oracle(emb_update=_VEC_UPSERT_SQL),
    description="QUANTIZER REFIT end to end (VERDICT r9 item 7, the "
    "recovery for the drift ann_recall_after_churn measures): a "
    "Lloyd-FITTED index is built on the original corpus, the churn "
    "slice is upserted against the now-stale artifacts, then "
    "refit_index re-fits the coarse quantizer on the CURRENT corpus, "
    "re-derives the seed codebook, re-encodes everything, and swaps "
    "the whole staged index in by atomic directory rename — probes "
    "see the old index or the new, never mixed quantizers (the one "
    "failure shape per-table guards cannot see); the refit marker "
    "generalizes the r9 upsert marker, landing atomically WITH the "
    "rewritten history so as-of probes below the refit generation "
    "refuse from the first post-swap read.  The probe must equal a "
    "fresh fitted build over the final corpus — the oracle replays "
    "the full Lloyd fit + encode + pruned ADC over the post-churn "
    "embeddings (the Lloyd-replay pattern with the updated relation "
    "feeding the whole chain)",
    tags=("similarity", "ann", "pq", "ivf", "index", "maintenance",
          "extension"),
)
def ann_index_refit_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..operators.similarity import ivf_fit_centroids
    from ..streaming.ann_ingest import refit_index, upsert_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    revised, final_emb = _churned_emb(emb)
    path = tempfile.mkdtemp(prefix="pq_index_refit_")
    build_pq_index(
        spark,
        emb,
        path,
        centroids=ivf_fit_centroids(
            emb.where(F.col("vec_id") != 0), n_iters=_IVF_FIT_ITERS
        ),
    )
    upsert_vectors(spark, path, revised, batch_id=1)
    refit_index(
        spark,
        path,
        final_emb,
        batch_id=2,
        centroids=ivf_fit_centroids(
            final_emb.where(F.col("vec_id") != 0),
            n_iters=_IVF_FIT_ITERS,
        ),
    )
    return _probe_with_labels(spark, sf_dir, path, nprobe=2)


@register(
    "ann_pq_persisted_batch_topk",
    f"""
    WITH {_FLAT},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    ),
    qdots AS (
      SELECT qf.vec_id AS qid, icent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN icent ON qf.i = icent.i
      WHERE qf.vec_id < 5
      GROUP BY 1, 2
    ),
    qprobes AS (
      SELECT qid, cid FROM (
        SELECT q.qid, q.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC,
                          q.cid ASC) AS rn
        FROM qdots q
        JOIN norms nq ON nq.vec_id = q.qid
        JOIN norms nc ON nc.vec_id = q.cid
      ) WHERE rn <= 2
    ),
    qtables AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT vec_id, s, i, x FROM psub WHERE vec_id < 5) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT t.qid, c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c
      JOIN assign g ON g.vec_id = c.vec_id
      JOIN qtables t ON t.s = c.s AND t.cid = c.code
      JOIN qprobes p ON p.qid = t.qid AND p.cid = g.list_id
      WHERE c.vec_id <> t.qid
      GROUP BY 1, 2
    )
    SELECT qid, vec_id, adc_dist, rank FROM (
      SELECT qid, vec_id, adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc_dist ASC, vec_id ASC)
                  AS INTEGER) AS rank
      FROM adc
    ) WHERE rank <= 5
    """,
    description="batch ANN over the PERSISTED PQ index, IVF-PRUNED "
    "(VERDICT r6 item 1 closed): top-5 ADC neighbors for 5 query "
    "vectors in ONE pass over the stored codes — each query ranks the "
    "8 broadcast coarse centroids, its 2 nearest (qid, list) probe "
    "pairs form a small broadcast relation joined against the codes "
    "scan's list_id PARTITION column (dynamic partition pruning, "
    "pinned by pytest), the per-query 64-entry distance tables "
    "concatenate into a single broadcast relation and a per-qid "
    "window takes each top-k.  Serving cost per batch is the union of "
    "touched lists' codes — never the whole corpus (round 6's batch "
    "probe scanned every stored code per trigger).  Self-matches "
    "excluded; the oracle replays encode + assignment + per-qid "
    "coarse ranking bit-for-bit",
    tags=("similarity", "ann", "pq", "ivf", "index", "batch",
          "extension"),
)
def ann_pq_persisted_batch_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ann_index import pq_batch_probe_topk

    path = _ensure_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return pq_batch_probe_topk(spark, path, queries, 5, nprobe=2)


@register(
    "ann_pq_filtered_batch_topk",
    f"""
    WITH {_FLAT},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    ),
    qdots AS (
      SELECT qf.vec_id AS qid, icent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN icent ON qf.i = icent.i
      WHERE qf.vec_id < 5
      GROUP BY 1, 2
    ),
    qprobes AS (
      SELECT qid, cid FROM (
        SELECT q.qid, q.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC,
                          q.cid ASC) AS rn
        FROM qdots q
        JOIN norms nq ON nq.vec_id = q.qid
        JOIN norms nc ON nc.vec_id = q.cid
      ) WHERE rn <= 2
    ),
    qtables AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT vec_id, s, i, x FROM psub WHERE vec_id < 5) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT t.qid, c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c
      JOIN assign g ON g.vec_id = c.vec_id
      JOIN qtables t ON t.s = c.s AND t.cid = c.code
      JOIN qprobes p ON p.qid = t.qid AND p.cid = g.list_id
      WHERE c.vec_id <> t.qid
        AND c.vec_id IN (SELECT vec_id FROM embeddings
                         WHERE label IN (1, 3, 5))
      GROUP BY 1, 2
    )
    SELECT qid, vec_id, adc_dist, rank FROM (
      SELECT qid, vec_id, adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc_dist ASC, vec_id ASC)
                  AS INTEGER) AS rank
      FROM adc
    ) WHERE rank <= 5
    """,
    description="FILTERED batch ANN — pq_batch_probe_topk(attr_pred): "
    "top-5 among label IN (1,3,5) vectors for 5 queries in ONE pass "
    "over the stored codes (round 11, the serving twin of "
    "ann_pq_filtered_topk).  The attrs side store prunes to the UNION "
    "of the batch's probed lists via the same broadcast probe-pair "
    "relation that prunes the codes scan, the predicate pushes into "
    "the pruned attrs scan, and the codes restriction is a vec_id "
    "semi-join — exact despite being shared across queries, because "
    "the per-(qid, list) pairing already confines each vector to the "
    "queries that probed its list.  Probe-time coverage guard "
    "included (codes in probed lists without attrs rows raise).  The "
    "oracle is the unfiltered batch replay with the label restriction "
    "on the ADC candidates",
    tags=("similarity", "ann", "pq", "ivf", "index", "batch",
          "filtered", "extension"),
)
def ann_pq_filtered_batch_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ann_index import pq_batch_probe_topk

    path = _ensure_pq_attrs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return pq_batch_probe_topk(
        spark,
        path,
        queries,
        5,
        nprobe=2,
        attr_pred=F.col("label").isin(1, 3, 5),
    )


VEC_DEDUP_THRESH = 1_000_000_000  # nano-quantized squared-L2 ~ 1.0


@register(
    "incremental_vector_dedup_sim",
    f"""
    WITH {_FLAT},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    acos AS (
      SELECT a.vec_id, a.cid,
             (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) AS ccos
      FROM adots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.cid
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    ),
    qtab AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT vec_id, s, i, x FROM psub WHERE vec_id % 2 = 1) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT t.qid, c.vec_id AS vid, CAST(SUM(t.qd) AS BIGINT) AS dist
      FROM pcodes c JOIN qtab t ON t.s = c.s AND t.cid = c.code
      GROUP BY 1, 2
    ),
    celled AS (
      SELECT d.qid, d.vid, d.dist FROM dist d
      JOIN assign aq ON aq.vec_id = d.qid
      JOIN assign av ON av.vec_id = d.vid
      WHERE aq.list_id = av.list_id
    ),
    rej AS (
      SELECT DISTINCT qid FROM celled
      WHERE dist <= {VEC_DEDUP_THRESH}
        AND ((vid % 2 = 0 AND vid <> 0) OR (vid % 2 = 1 AND vid < qid))
    )
    SELECT vec_id, CAST(0 AS INTEGER) AS batch_id FROM embeddings
    WHERE vec_id % 2 = 0 AND vec_id <> 0
    UNION ALL
    SELECT vec_id, CAST(1 AS INTEGER) AS batch_id FROM embeddings
    WHERE vec_id % 2 = 1
      AND vec_id NOT IN (SELECT qid FROM rej)
    """,
    description="incremental VECTOR dedup simulated as a batch plan "
    "(the SemDeDup-family gate on the streaming-ingest seam, "
    "streaming/vector_dedup.py): evens are the indexed corpus, odds "
    "arrive as micro-batch 1 and are rejected when their ADC distance "
    "to any SAME-IVF-CELL stored vector — or lower-id same-cell batch "
    "peer — is at or under the threshold; survivors' codes join the "
    "index.  Candidate pairs are cell-local (the vector analogue of "
    "corpus_dedup's band-bucket joins; cross-cell near-dups are the "
    "stated IVF recall trade), distances are 8-byte-code ADC via "
    "broadcast per-query tables, all exact BIGINT.  The real sink is "
    "exercised end to end (build -> sink -> read back), hash-checked "
    "against a full SQL replay of encode + assignment + cell-local "
    "pair distances",
    tags=("similarity", "dedup", "ann", "index", "streaming",
          "extension"),
)
def incremental_vector_dedup_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.vector_dedup import streaming_vector_dedup_sink

    emb = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="vec_dedup_")
    build_pq_index(
        spark,
        emb,
        f"{tmp}/index",
        corpus=emb.where(
            (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
        ),
    )
    sink = streaming_vector_dedup_sink(
        f"{tmp}/index", f"{tmp}/accepted", VEC_DEDUP_THRESH
    )
    sink(emb.where(F.col("vec_id") % 2 == 1), 1)
    evens = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)
    ).select("vec_id", F.lit(0).cast("int").alias("batch_id"))
    odds = (
        spark.read.parquet(f"{tmp}/accepted")
        .select("vec_id", F.lit(1).cast("int").alias("batch_id"))
    )
    return evens.unionByName(odds)


_RECALL_SAMPLE_MOD = 8  # report sample: odd vec_ids with vec_id % 8 == 1


@register(
    "vector_dedup_recall_report",
    f"""
    WITH {_FLAT},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    acos AS (
      SELECT a.vec_id, a.cid,
             (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) AS ccos
      FROM adots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.cid
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    ),
    qprobes AS (
      SELECT vec_id AS qid, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos WHERE vec_id % 2 = 1
      ) WHERE rn <= 2
    ),
    qtab AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT vec_id, s, i, x FROM psub WHERE vec_id % 2 = 1) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT t.qid, c.vec_id AS vid, CAST(SUM(t.qd) AS BIGINT) AS dist
      FROM pcodes c JOIN qtab t ON t.s = c.s AND t.cid = c.code
      GROUP BY 1, 2
    ),
    rej1 AS (
      SELECT DISTINCT d.qid FROM dist d
      JOIN assign aq ON aq.vec_id = d.qid
      JOIN assign av ON av.vec_id = d.vid
      WHERE aq.list_id = av.list_id
        AND d.dist <= {VEC_DEDUP_THRESH}
        AND ((d.vid % 2 = 0 AND d.vid <> 0)
             OR (d.vid % 2 = 1 AND d.vid < d.qid))
    ),
    rej2 AS (
      SELECT DISTINCT d.qid FROM dist d
      JOIN qprobes p ON p.qid = d.qid
      JOIN assign av ON av.vec_id = d.vid AND av.list_id = p.cid
      WHERE d.dist <= {VEC_DEDUP_THRESH}
        AND ((d.vid % 2 = 0 AND d.vid <> 0)
             OR (d.vid % 2 = 1 AND d.vid < d.qid))
    ),
    sample AS (
      SELECT vec_id AS qid FROM embeddings
      WHERE vec_id % {_RECALL_SAMPLE_MOD} = 1 AND vec_id % 2 = 1
    ),
    truth AS (
      SELECT s.qid, f2.vec_id AS vid,
             SUM(CAST(FLOOR((f1.x - f2.x) * (f1.x - f2.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS tdist
      FROM sample s
      JOIN flat f1 ON f1.vec_id = s.qid
      JOIN flat f2 ON f2.i = f1.i
      WHERE f2.vec_id <> 0 AND f2.vec_id <> s.qid
        AND (f2.vec_id % 2 = 0 OR f2.vec_id < s.qid)
      GROUP BY 1, 2
    ),
    truerej AS (
      SELECT DISTINCT qid FROM truth WHERE tdist <= {VEC_DEDUP_THRESH}
    ),
    rej8 AS (
      SELECT DISTINCT d.qid FROM dist d
      WHERE d.dist <= {VEC_DEDUP_THRESH}
        AND ((d.vid % 2 = 0 AND d.vid <> 0)
             OR (d.vid % 2 = 1 AND d.vid < d.qid))
    ),
    flags AS (
      SELECT s.qid,
             CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END AS is_t,
             CASE WHEN r1.qid IS NOT NULL THEN 1 ELSE 0 END AS is_r1,
             CASE WHEN r2.qid IS NOT NULL THEN 1 ELSE 0 END AS is_r2,
             CASE WHEN r8.qid IS NOT NULL THEN 1 ELSE 0 END AS is_r8
      FROM sample s
      LEFT JOIN truerej t ON t.qid = s.qid
      LEFT JOIN rej1 r1 ON r1.qid = s.qid
      LEFT JOIN rej2 r2 ON r2.qid = s.qid
      LEFT JOIN rej8 r8 ON r8.qid = s.qid
    )
    SELECT 'cell_local' AS method,
           CAST(SUM(is_t) AS BIGINT) AS n_true_dups,
           CAST(SUM(is_r1) AS BIGINT) AS n_rejected,
           CAST(SUM(is_t * is_r1) AS BIGINT) AS n_caught,
           CAST(SUM(is_t * (1 - is_r1)) AS BIGINT) AS n_missed
    FROM flags
    UNION ALL
    SELECT 'multiprobe_2' AS method,
           CAST(SUM(is_t) AS BIGINT) AS n_true_dups,
           CAST(SUM(is_r2) AS BIGINT) AS n_rejected,
           CAST(SUM(is_t * is_r2) AS BIGINT) AS n_caught,
           CAST(SUM(is_t * (1 - is_r2)) AS BIGINT) AS n_missed
    FROM flags
    UNION ALL
    SELECT 'all_cells_adc' AS method,
           CAST(SUM(is_t) AS BIGINT) AS n_true_dups,
           CAST(SUM(is_r8) AS BIGINT) AS n_rejected,
           CAST(SUM(is_t * is_r8) AS BIGINT) AS n_caught,
           CAST(SUM(is_t * (1 - is_r8)) AS BIGINT) AS n_missed
    FROM flags
    ORDER BY method
    """,
    description="MEASURED recall of the incremental vector-dedup gate "
    "(VERDICT r6 item 4): the cell-local (nprobe=1), multi-probe "
    "(nprobe=2) and all-cells (nprobe=8 — pure-ADC, no cell miss "
    "possible) rejection sets, produced by the REAL "
    "dedup_vector_batch operator over the evens-indexed/odds-batch "
    "split, are compared against exact-L2 ground truth (quantized "
    "BIGINT squared distance, every candidate pair) on the "
    "deterministic 1-in-8 query sample — n_true_dups / n_rejected / "
    "n_caught / n_missed per method as hash-checked integers.  The "
    "cross-cell false-negative trade is now a number, not a "
    "disclaimer, nprobe is its dial (candidates grow to the probed "
    "cells' occupancy, never |corpus|), and the all-cells row "
    "decomposes misses into cell-assignment vs ADC-quantization.  The "
    "truth side is the sample-capped brute-force verifier pattern "
    "(embedding_near_pairs): a broadcast |sample|-row side against "
    "one corpus scan",
    tags=("similarity", "dedup", "ann", "quality", "extension"),
)
def vector_dedup_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ann_index import encode_pq_codes, l2q, pq_codebook
    from ..operators.similarity import ivf_centroids
    from ..streaming.vector_dedup import dedup_vector_batch

    emb = load_table(spark, sf_dir, "embeddings")
    evens = emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0))
    odds = emb.where(F.col("vec_id") % 2 == 1)
    codebook = pq_codebook(emb)
    centroids = ivf_centroids(emb)
    store_codes = encode_pq_codes(
        evens.select("vec_id", "embedding"), codebook, centroids
    )
    sample = odds.where(
        F.col("vec_id") % _RECALL_SAMPLE_MOD == 1
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    cands = emb.where(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("ve")
    )
    truth = (
        cands.join(
            F.broadcast(sample),
            (F.col("vid") != F.col("qid"))
            & ((F.col("vid") % 2 == 0) | (F.col("vid") < F.col("qid"))),
        )
        .select("qid", "vid", l2q(F.col("qe"), F.col("ve")).alias("tdist"))
    )
    true_rej = (
        truth.where(F.col("tdist") <= F.lit(VEC_DEDUP_THRESH))
        .select("qid")
        .distinct()
        .withColumnRenamed("qid", "vec_id")
        .withColumn("_t", F.lit(1))
    )
    sample_ids = sample.select(F.col("qid").alias("vec_id"))

    def counts(name: str, nprobe: int) -> DataFrame:
        survivors, _ = dedup_vector_batch(
            odds.select("vec_id", "embedding"),
            store_codes,
            codebook,
            centroids,
            VEC_DEDUP_THRESH,
            nprobe=nprobe,
        )
        rejected = (
            odds.select("vec_id")
            .join(survivors.select("vec_id"), "vec_id", "left_anti")
            .withColumn("_r", F.lit(1))
        )
        flags = (
            sample_ids.join(true_rej, "vec_id", "left")
            .join(rejected, "vec_id", "left")
            .select(
                F.coalesce(F.col("_t"), F.lit(0)).alias("is_t"),
                F.coalesce(F.col("_r"), F.lit(0)).alias("is_r"),
            )
        )
        return flags.agg(
            F.sum("is_t").cast("bigint").alias("n_true_dups"),
            F.sum("is_r").cast("bigint").alias("n_rejected"),
            F.sum(F.col("is_t") * F.col("is_r")).cast("bigint").alias(
                "n_caught"
            ),
            F.sum(F.col("is_t") * (F.lit(1) - F.col("is_r")))
            .cast("bigint")
            .alias("n_missed"),
        ).select(F.lit(name).alias("method"), "*")

    return (
        counts("cell_local", 1)
        .unionByName(counts("multiprobe_2", 2))
        .unionByName(counts("all_cells_adc", 8))
        .orderBy("method")
    )


def _pq_fitted_codebook_oracle() -> str:
    """DuckDB replay of the FITTED-PQ-codebook persisted index: one
    per-subspace Lloyd round (seed init, quantized FLOAT means — the
    ivf_fit_centroids arithmetic on (s, cid) keys), then encode + ADC
    against the fitted codebook and the seed IVF assignment — exactly
    what ``build_pq_index(codebook=pq_fit_codebook(...))`` stores and
    ``pq_probe_topk`` scans."""
    return f"""
    WITH {_FLAT},
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    cbf0 AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    fd1 AS (
      SELECT pc.vec_id, pc.s, cb.cid,
             SUM(CAST(FLOOR((pc.x - cb.x) * (pc.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp pc JOIN cbf0 cb ON pc.i = cb.i AND pc.s = cb.s
      GROUP BY 1, 2, 3
    ),
    fa1 AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM fd1
      ) WHERE rn = 1
    ),
    fm1 AS (
      SELECT a.cid, pc.s, pc.i,
             CAST(CAST(
               (CAST(SUM(CAST(FLOOR(pc.x * {QV!r} + 0.5) AS BIGINT))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {QV!r}
               AS FLOAT) AS DOUBLE) AS x
      FROM pcorp pc
      JOIN fa1 a ON a.vec_id = pc.vec_id AND a.s = pc.s
      GROUP BY 1, 2, 3
    ),
    cbf1 AS (
      SELECT p.cid, p.s, p.i, COALESCE(m.x, p.x) AS x
      FROM cbf0 p
      LEFT JOIN fm1 m ON m.cid = p.cid AND m.s = p.s AND m.i = p.i
    ),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, cb.cid,
             SUM(CAST(FLOOR((pcorp.x - cb.x) * (pcorp.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN cbf1 cb ON pcorp.i = cb.i AND pcorp.s = cb.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    qtable AS (
      SELECT cb.s, cb.cid,
             SUM(CAST(FLOOR((qf.x - cb.x) * (qf.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psub WHERE vec_id = 0) qf
      JOIN cbf1 cb ON cb.i = qf.i AND cb.s = qf.s
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    acos AS (
      SELECT a.vec_id, a.cid,
             (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) AS ccos
      FROM adots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.cid
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    )
    SELECT a.vec_id, e.label, CAST(g.list_id AS BIGINT) AS list_id,
           a.adc_dist
    FROM adc a
    JOIN assign g ON g.vec_id = a.vec_id
    JOIN embeddings e ON e.vec_id = a.vec_id
    ORDER BY a.adc_dist ASC, a.vec_id ASC
    LIMIT 10
    """


_PQ_CB_FITTED_INDEX_CACHE: dict[str, str] = {}


@register(
    "ann_pq_fitted_codebook_topk",
    _pq_fitted_codebook_oracle(),
    description="the OTHER half of the fitted production index: the PQ "
    "sub-quantizer itself is k-means-fitted (one per-subspace Lloyd "
    "round from the seed init, integer-exact means — "
    "operators/ann_index.pq_fit_codebook, the PQ twin of "
    "ivf_fit_centroids with the same lazy fit-on-first-action "
    "contract), persisted via build_pq_index(codebook=...), and the "
    "full-ADC probe scans only the stored artifact.  With "
    "ann_pq_persisted_fitted_topk (fitted coarse centroids) this "
    "makes BOTH quantizer artifacts k-means products, each "
    "hash-pinned: the oracle replays the per-subspace fit, the "
    "re-encode under the fitted codebook, and the ADC scan "
    "bit-for-bit",
    tags=("similarity", "ann", "pq", "index", "extension"),
)
def ann_pq_fitted_codebook_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    key = dataset_cache_key(sf_dir)
    path = _PQ_CB_FITTED_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        from ..operators.ann_index import build_pq_index, pq_fit_codebook

        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.where(F.col("vec_id") != 0)
        path = tempfile.mkdtemp(prefix="pq_index_fitted_cb_")
        build_pq_index(
            spark, emb, path, codebook=pq_fit_codebook(corpus, n_iters=1)
        )
        _PQ_CB_FITTED_INDEX_CACHE[key] = path
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


def _pq_fully_fitted_oracle(n_iters: int = _IVF_FIT_ITERS) -> str:
    """DuckDB replay of the FULLY fitted persisted index: the IVF
    Lloyd chain (:func:`_fitted_centroid_ctes`) AND the per-subspace
    PQ Lloyd round (the :func:`_pq_fitted_codebook_oracle` CTEs)
    compose — encode against the fitted codebook, assign against the
    fitted centroids, probe the query's 2 nearest fitted lists.
    Exactly what ``build_pq_index(centroids=ivf_fit_centroids(...),
    codebook=pq_fit_codebook(...))`` stores and
    ``pq_probe_topk(nprobe=2)`` scans."""
    ctes, fin, prev = _fitted_centroid_ctes(n_iters)
    ctes.append(
        f"""psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    )"""
    )
    ctes.append(
        "pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0)"
    )
    ctes.append(
        """cbf0 AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    )"""
    )
    ctes.append(
        f"""fd1 AS (
      SELECT pc.vec_id, pc.s, cb.cid,
             SUM(CAST(FLOOR((pc.x - cb.x) * (pc.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp pc JOIN cbf0 cb ON pc.i = cb.i AND pc.s = cb.s
      GROUP BY 1, 2, 3
    )"""
    )
    ctes.append(
        """fa1 AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM fd1
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""fm1 AS (
      SELECT a.cid, pc.s, pc.i,
             CAST(CAST(
               (CAST(SUM(CAST(FLOOR(pc.x * {QV!r} + 0.5) AS BIGINT))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {QV!r}
               AS FLOAT) AS DOUBLE) AS x
      FROM pcorp pc
      JOIN fa1 a ON a.vec_id = pc.vec_id AND a.s = pc.s
      GROUP BY 1, 2, 3
    )"""
    )
    ctes.append(
        """cbf1 AS (
      SELECT p.cid, p.s, p.i, COALESCE(m.x, p.x) AS x
      FROM cbf0 p
      LEFT JOIN fm1 m ON m.cid = p.cid AND m.s = p.s AND m.i = p.i
    )"""
    )
    ctes.append(
        f"""pdists AS (
      SELECT pcorp.vec_id, pcorp.s, cb.cid,
             SUM(CAST(FLOOR((pcorp.x - cb.x) * (pcorp.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN cbf1 cb ON pcorp.i = cb.i AND pcorp.s = cb.s
      GROUP BY 1, 2, 3
    )"""
    )
    ctes.append(
        """pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""qtable AS (
      SELECT cb.s, cb.cid,
             SUM(CAST(FLOOR((qf.x - cb.x) * (qf.x - cb.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psub WHERE vec_id = 0) qf
      JOIN cbf1 cb ON cb.i = qf.i AND cb.s = qf.s
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        """adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c JOIN qtable t ON t.s = c.s AND t.cid = c.code
      GROUP BY c.vec_id
    )"""
    )
    ctes.append(
        f"""qd AS (
      SELECT c.cid,
             CAST(SUM(CAST(FLOOR(qf.x * c.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN {prev} c ON qf.i = c.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT q.cid FROM qd q
      JOIN norms nq ON nq.vec_id = 0
      JOIN cn{fin} cn ON cn.cid = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(cn.n2))) DESC, q.cid ASC
      LIMIT 2
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT a.vec_id, e.label, CAST(g.list_id AS BIGINT) AS list_id,
           a.adc_dist
    FROM adc a
    JOIN asg{fin} g ON g.vec_id = a.vec_id
    JOIN embeddings e ON e.vec_id = a.vec_id
    WHERE g.list_id IN (SELECT cid FROM probes)
    ORDER BY a.adc_dist ASC, a.vec_id ASC
    LIMIT 10
    """


_PQ_FULL_FITTED_INDEX_CACHE: dict[str, str] = {}


@register(
    "ann_pq_fully_fitted_topk",
    _pq_fully_fitted_oracle(),
    description="the COMPLETE production index in one artifact: BOTH "
    "quantizers k-means-fitted (2 Lloyd iterations for the coarse "
    "centroids, 1 per-subspace round for the PQ codebook — both lazy, "
    "integer-exact), persisted together via build_pq_index(centroids="
    "..., codebook=...), corpus encoded/assigned against the fitted "
    "artifacts, and the probe partition-pruned to the query's 2 "
    "nearest fitted lists — fit(x2) -> persist -> probe, all from "
    "stored tables, no fit or encode subtree at query time.  The "
    "oracle composes the two fitted replay chains (IVF Lloyd + "
    "per-subspace PQ Lloyd) bit-for-bit, so the driver hash pins the "
    "entire fitted artifact set at once",
    tags=("similarity", "ann", "pq", "ivf", "index", "extension"),
)
def ann_pq_fully_fitted_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    key = dataset_cache_key(sf_dir)
    path = _PQ_FULL_FITTED_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        from ..operators.ann_index import build_pq_index, pq_fit_codebook
        from ..operators.similarity import ivf_fit_centroids

        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.where(F.col("vec_id") != 0)
        path = tempfile.mkdtemp(prefix="pq_index_full_fitted_")
        build_pq_index(
            spark,
            emb,
            path,
            centroids=ivf_fit_centroids(corpus, n_iters=_IVF_FIT_ITERS),
            codebook=pq_fit_codebook(corpus, n_iters=1),
        )
        _PQ_FULL_FITTED_INDEX_CACHE[key] = path
    return _probe_with_labels(spark, sf_dir, path, nprobe=2)


@register(
    "ann_index_compact_sim",
    _pq_persisted_oracle(
        probed=False, corpus_pred="vec_id <> 0 AND vec_id % 5 <> 2"
    ),
    description="the full ANN index MAINTENANCE cycle at hash grade "
    "(VERDICT r7 item 6): build the frozen generation over the even "
    "vec_ids, stream the odds in as batch 1 (generational append), "
    "erase every vec_id % 5 == 2 (partition-local rewrites fragment "
    "the store), then compact_index folds the erasure-fragmented "
    "generations into ONE frozen generation (two-phase, vec_id-deduped "
    "fold) — and the full-ADC probe of the compacted single-generation "
    "index must equal an index that never contained the erased "
    "vectors.  The oracle replays encode + assignment + ADC over the "
    "survivors only; the single-generation layout restoration is "
    "additionally pytest-pinned",
    tags=("similarity", "ann", "pq", "index", "maintenance",
          "extension"),
)
def ann_index_compact_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.ann_ingest import (
        compact_index,
        delete_vectors,
        streaming_ann_index_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_compact_")
    build_pq_index(
        spark,
        emb,
        path,
        corpus=emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0)),
    )
    sink = streaming_ann_index_sink(path)
    sink(emb.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"), 1)
    doomed = [
        int(r["vec_id"])
        for r in emb.where(F.col("vec_id") % 5 == 2)
        .select("vec_id")
        .collect()
    ]
    delete_vectors(spark, path, doomed)
    compact_index(spark, path, upto_batch_id=2)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None)


_BINARY_WORDS_CTE = """
  words AS (
    SELECT vec_id, CAST((i - 1) // 16 AS INTEGER) AS w,
           CAST(SUM(CASE WHEN x > 0
                    THEN (CAST(1 AS BIGINT) << CAST((i - 1) % 16 AS INTEGER))
                    ELSE 0 END) AS BIGINT) AS word
    FROM flat GROUP BY 1, 2
  ),
  qw AS (SELECT w, word FROM words WHERE vec_id = 0),
  ham AS (
    SELECT v.vec_id,
           CAST(SUM(bit_count(xor(v.word, q.word))) AS INTEGER) AS hamming
    FROM words v JOIN qw q ON q.w = v.w
    WHERE v.vec_id <> 0
    GROUP BY 1
  )
"""


@register(
    "ann_binary_hamming_topk",
    f"""
    WITH {_FLAT},
    {_BINARY_WORDS_CTE}
    SELECT vec_id, hamming FROM ham
    ORDER BY hamming ASC, vec_id ASC
    LIMIT 10
    """,
    description="binary (sign) quantization + Hamming top-10: each "
    "64-dim embedding packs to FOUR 16-bit sign words (8 bytes — 1/32 "
    "of the float32 vector; strict x>0 so the boundary is "
    "engine-exact), and ranking is per-word XOR + popcount summed — "
    "integer arithmetic end to end, hash-exact by construction.  The "
    "cheapest ANN family and the standard billion-scale PREFILTER "
    "shape: the scan side is the 8-byte sketch column, the query "
    "broadcast, the top-k a TakeOrdered — at 10^11 vectors the sketch "
    "table is 0.8 TB where the raw vectors are 25 TB",
    tags=("similarity", "ann", "binary", "extension"),
)
def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import binary_hamming_topk, sign_words

    emb = load_table(spark, sf_dir, "embeddings")
    words = emb.select("vec_id", sign_words(F.col("embedding")).alias("wrd"))
    q = words.where(F.col("vec_id") == 0).select(F.col("wrd").alias("qw"))
    return binary_hamming_topk(words.where(F.col("vec_id") != 0), q, 10)


_BINARY_SHORTLIST = 50


@register(
    "ann_binary_rerank_topk",
    f"""
    WITH {_FLAT},
    {_BINARY_WORDS_CTE},
    short AS (
      SELECT vec_id, hamming FROM (
        SELECT vec_id, hamming,
               ROW_NUMBER() OVER (ORDER BY hamming ASC, vec_id ASC) AS rn
        FROM ham
      ) WHERE rn <= {_BINARY_SHORTLIST}
    ),
    qf AS (SELECT i, x FROM flat WHERE vec_id = 0),
    ssums AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat cf JOIN qf ON cf.i = qf.i
      WHERE cf.vec_id IN (SELECT vec_id FROM short)
      GROUP BY cf.vec_id
    )
    SELECT s.vec_id, sh.hamming,
           (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) AS cosine
    FROM ssums s
    JOIN short sh ON sh.vec_id = s.vec_id
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = 0
    ORDER BY cosine DESC, s.vec_id ASC
    LIMIT 10
    """,
    description="the binary-prefilter -> exact-rerank serving stack "
    f"(the production use of the sign sketch): Hamming top-"
    f"{_BINARY_SHORTLIST} shortlist over the 8-byte words (totally "
    "ordered: hamming, vec_id), then EXACT quantized cosine reranks "
    "only the shortlist — full metric fidelity paid on 50 vectors "
    "instead of the corpus.  The oracle replays both stages "
    "(pack -> popcount ranking -> shortlist -> integer-exact cosine) "
    "so the hash pins the stage boundary too, not just the final "
    "ranking",
    tags=("similarity", "ann", "binary", "rerank", "extension"),
)
def ann_binary_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_given_bnorm
    from ..operators.similarity import binary_hamming_topk, sign_words

    emb = load_table(spark, sf_dir, "embeddings")
    words = emb.select("vec_id", sign_words(F.col("embedding")).alias("wrd"))
    q = words.where(F.col("vec_id") == 0).select(F.col("wrd").alias("qw"))
    short = binary_hamming_topk(
        words.where(F.col("vec_id") != 0), q, _BINARY_SHORTLIST
    )
    qe = (
        emb.where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qe"))
        .withColumn("qn2", norm2(F.col("qe")))
    )
    return (
        short.join(emb.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(qe))
        .select(
            "vec_id",
            "hamming",
            cosine_given_bnorm(
                F.col("embedding"), F.col("qe"), F.col("qn2")
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ann_index_asof_sim",
    _pq_persisted_oracle(
        probed=False, corpus_pred="vec_id <> 0 AND vec_id % 3 <> 2"
    ),
    description="TIME-TRAVEL probe of the generational ANN index "
    "(pq_probe_topk(upto_batch_id=...) — bm25_topk_asof's vector "
    "twin, the same training-reproducibility contract): the build "
    "indexes vec_id % 3 == 0 (frozen generation), batches 1 and 2 "
    "ingest % 3 == 1 and % 3 == 2 against the stored quantizer, and "
    "the full-ADC probe AS OF batch 1 must equal an index that never "
    "saw batch 2 — batch_id <= N partition pruning on the codes scan, "
    "zero cost over the live probe.  No correction bookkeeping exists "
    "or is needed on this side: ADC carries no corpus statistics, and "
    "erasure physically removes rows from every generation, so no "
    "as-of view can resurrect an erased vector",
    tags=("similarity", "ann", "pq", "index", "time-travel",
          "extension"),
)
def ann_index_asof_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_index
    from ..streaming.ann_ingest import streaming_ann_index_sink

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_asof_")
    build_pq_index(
        spark,
        emb,
        path,
        corpus=emb.where((F.col("vec_id") % 3 == 0) & (F.col("vec_id") != 0)),
    )
    sink = streaming_ann_index_sink(path)
    sink(emb.where(F.col("vec_id") % 3 == 1).select("vec_id", "embedding"), 1)
    sink(emb.where(F.col("vec_id") % 3 == 2).select("vec_id", "embedding"), 2)
    return _probe_with_labels(spark, sf_dir, path, nprobe=None,
                              upto_batch_id=1)
