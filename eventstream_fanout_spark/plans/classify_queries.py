"""Fitted-classifier queries with DuckDB oracles.

The model-based filter stage of an LLM data pipeline: fit on a
deterministic train split (``id % 5 <> 0``), score the held-out split
(``id % 5 = 0``).  All scoring is exact integer arithmetic
(operators/classify.py) so the oracle reproduces every score and every
argmax bit-for-bit — including the tie-breaks.

Reference parity: /root/reference has no model surface; north-star
extension scope (SURVEY.md §2 extension inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_tokens
from ..operators.classify import (
    QC,
    QP,
    QW,
    centroid_classify,
    centroid_fit,
    confusion_matrix,
    token_weight_classify,
    token_weight_fit,
)
from ..operators.linalg import QC_COV
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------- #
# nearest-centroid embedding classifier                             #
# ---------------------------------------------------------------- #

_CENTROID_CTE = f"""
  flat AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
  ),
  q AS (
    SELECT vec_id, label, i,
           CAST(FLOOR(x * {QC!r} + 0.5) AS BIGINT) AS qx
    FROM flat
  ),
  sums AS (
    SELECT label, i, CAST(SUM(qx) AS BIGINT) AS s
    FROM q WHERE vec_id % 5 <> 0 GROUP BY label, i
  ),
  nlab AS (
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n
    FROM embeddings WHERE vec_id % 5 <> 0 GROUP BY label
  ),
  cent AS (
    SELECT s.label, s.i,
           CAST(FLOOR(CAST(s.s AS DOUBLE) / n.n) AS BIGINT) AS c
    FROM sums s JOIN nlab n ON n.label = s.label
  ),
  scored AS (
    SELECT t.vec_id, t.label AS label_true, c.label AS label_pred,
           CAST(SUM(c.c * t.qx) AS BIGINT) AS score
    FROM q t JOIN cent c ON c.i = t.i
    WHERE t.vec_id % 5 = 0
    GROUP BY t.vec_id, t.label, c.label
  ),
  preds AS (
    SELECT vec_id, label_true, label_pred, score AS score_top
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY score DESC, label_pred ASC) AS rnk
      FROM scored
    ) WHERE rnk = 1
  )
"""


def _centroid_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 5 != 0)
    test = emb.where(F.col("vec_id") % 5 == 0)
    return centroid_classify(test, centroid_fit(train))


@register(
    "centroid_classifier_report",
    f"WITH {_CENTROID_CTE} SELECT * FROM preds",
    description="nearest-centroid embedding classifier: fit integer "
    "centroids per label on the vec_id%5<>0 split, classify the held-out "
    "split by exact BIGINT dot (broadcast labels x dim centroid table; "
    "ties to the smaller label)",
    tags=("classify", "embedding", "extension"),
)
def centroid_classifier_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _centroid_preds(spark, sf_dir)


@register(
    "centroid_classifier_confusion",
    f"""
    WITH {_CENTROID_CTE}
    SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM preds GROUP BY label_true, label_pred
    """,
    description="confusion matrix of the nearest-centroid classifier "
    "(the evaluation aggregate a curation run gates on)",
    tags=("classify", "embedding", "extension"),
)
def centroid_classifier_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return confusion_matrix(
        _centroid_preds(spark, sf_dir), "label_true", "label_pred"
    )


# ---------------------------------------------------------------- #
# smoothed token-weight voting classifier (NB-shaped lang-id)       #
# ---------------------------------------------------------------- #

_LANG_CTE = f"""
  occ AS (
    SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
    FROM documents
  ),
  train_occ AS (SELECT * FROM occ WHERE doc_id % 5 <> 0),
  cnt AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM train_occ GROUP BY lang, tok
  ),
  tot AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot
    FROM train_occ GROUP BY lang
  ),
  vocab AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM train_occ
  ),
  weights AS (
    SELECT c.lang, c.tok,
           CAST(FLOOR((c.cnt + 1.0) / (t.tot + v.v) * {QW!r}) AS BIGINT)
             AS w
    FROM cnt c JOIN tot t ON t.lang = c.lang CROSS JOIN vocab v
  ),
  ndocs AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
    FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang
  ),
  totals AS (
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 5 <> 0)
                AS BIGINT) AS ntot,
           CAST((SELECT COUNT(*) FROM ndocs) AS BIGINT) AS nclasses
  ),
  priors AS (
    SELECT lang,
           CAST(FLOOR((nd + 1.0) / (ntot + nclasses) * {QP!r}) AS BIGINT)
             AS prior_w
    FROM ndocs CROSS JOIN totals
  ),
  test_toks AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM occ WHERE doc_id % 5 = 0 GROUP BY doc_id, tok
  ),
  matched AS (
    SELECT dt.doc_id, w.lang, CAST(SUM(w.w * dt.n_occ) AS BIGINT)
             AS tok_score
    FROM test_toks dt JOIN weights w ON w.tok = dt.tok
    GROUP BY dt.doc_id, w.lang
  ),
  skeleton AS (
    SELECT d.doc_id, d.lang AS lang_true, p.lang, p.prior_w
    FROM documents d CROSS JOIN priors p
    WHERE d.doc_id % 5 = 0
  ),
  lang_scored AS (
    SELECT s.doc_id, s.lang_true, s.lang AS lang_pred,
           CAST(s.prior_w + COALESCE(m.tok_score, 0) AS BIGINT) AS score
    FROM skeleton s
    LEFT JOIN matched m ON m.doc_id = s.doc_id AND m.lang = s.lang
  ),
  lang_preds AS (
    SELECT doc_id, lang_true, lang_pred, score AS score_top
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, lang_pred ASC) AS rnk
      FROM lang_scored
    ) WHERE rnk = 1
  )
"""


def _lang_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    weights, priors = token_weight_fit(train, "lang")
    return token_weight_classify(test, weights, priors, "lang")


@register(
    "lang_classifier_report",
    f"WITH {_LANG_CTE} SELECT * FROM lang_preds",
    description="fitted lang-id: NB-shaped smoothed token-weight voting "
    "classifier (integer weights floor((cnt+1)/(tot+V)*1e12) — the "
    "hash-stable stand-in for a float log-sum; ties to the smaller lang)",
    tags=("classify", "text", "extension"),
)
def lang_classifier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lang_preds(spark, sf_dir)


@register(
    "lang_classifier_confusion",
    f"""
    WITH {_LANG_CTE}
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM lang_preds GROUP BY lang_true, lang_pred
    """,
    description="confusion matrix of the fitted lang-id classifier vs "
    "the labelled lang column",
    tags=("classify", "text", "extension"),
)
def lang_classifier_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return confusion_matrix(
        _lang_preds(spark, sf_dir), "lang_true", "lang_pred"
    )


# ---------------------------------------------------------------- #
# kNN classifier (majority vote of quantized-cosine top-5)          #
# ---------------------------------------------------------------- #

# the kNN eval batch is CONSTANT by construction (vec_id < EVAL_CAP on
# the test split — <=100 vectors at any sf), so broadcasting it is a
# bounded map, not a corpus-fraction cross product; full-corpus kNN
# classification at scale routes through the persisted IVF batch probe
# (operators/ann_index.py pq_batch_probe_topk) with the same vote.
EVAL_CAP = 500


def _knn_oracle(k: int = 5) -> str:
    from ..functions.vectors import QV

    return f"""
    WITH flat AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    ),
    sums AS (
      SELECT q.vec_id AS qid, q.label AS label_true, c.vec_id,
             c.label AS nb_label,
             CAST(SUM(CAST(FLOOR(c.x * q.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat c JOIN flat q ON c.i = q.i
      WHERE c.vec_id % 5 <> 0
        AND q.vec_id % 5 = 0 AND q.vec_id < {EVAL_CAP}
      GROUP BY q.vec_id, q.label, c.vec_id, c.label
    ),
    topk AS (
      SELECT qid, label_true, nb_label FROM (
        SELECT s.*, ROW_NUMBER() OVER (
          PARTITION BY s.qid
          ORDER BY (s.dot / (sqrt(nc.n2) * sqrt(nq.n2))) DESC,
                   s.vec_id ASC) AS rnk
        FROM sums s
        JOIN norms nc ON nc.vec_id = s.vec_id
        JOIN norms nq ON nq.vec_id = s.qid
      ) WHERE rnk <= {k}
    ),
    votes AS (
      SELECT qid AS vec_id, label_true, nb_label AS label_pred,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM topk GROUP BY qid, label_true, nb_label
    )
    SELECT vec_id, label_true, label_pred, n_votes FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id
        ORDER BY n_votes DESC, label_pred ASC) AS vr
      FROM votes
    ) WHERE vr = 1
    """


@register(
    "knn_classifier_report",
    _knn_oracle(),
    description="kNN classifier: majority label of the quantized-cosine "
    "top-5 train neighbors for a CONSTANT <=100-vector eval batch "
    "(vec_id < 500 on the held-out split; vote ties to the smaller "
    "label, distance ties to the smaller vec_id).  One corpus scan "
    "serves the whole batch (ann_batch_topk shape); full-corpus kNN "
    "classification at scale routes through the persisted IVF batch "
    "probe (operators/ann_index.py pq_batch_probe_topk), same vote.",
    tags=("classify", "similarity", "extension"),
)
def knn_classifier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine_given_norms as _cgn
    from ..functions.vectors import norm2 as _norm2

    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per ROW on both sides (the broadcast test batch
    # carries its norm), so the train-x-test pair evaluation folds one
    # BIGINT dot instead of a 3-field struct — bit-identical values
    # (cosine_given_norms shares cosine()'s sums and IEEE combine)
    train = emb.where(F.col("vec_id") % 5 != 0).select(
        "vec_id",
        F.col("label").alias("nb_label"),
        "embedding",
        _norm2(F.col("embedding")).alias("n2c"),
    )
    test = emb.where(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < EVAL_CAP)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("label_true"),
        F.col("embedding").alias("qe"),
        _norm2(F.col("embedding")).alias("n2q"),
    )
    scored = train.crossJoin(F.broadcast(test)).select(
        "qid",
        "label_true",
        "vec_id",
        "nb_label",
        _cgn(
            F.col("embedding"), F.col("qe"), F.col("n2c"), F.col("n2q")
        ).alias("cosine"),
    )
    wk = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = scored.withColumn("rnk", F.row_number().over(wk)).where(
        F.col("rnk") <= 5
    )
    votes = topk.groupBy("qid", "label_true", "nb_label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.desc("n_votes"), F.asc("nb_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            "label_true",
            F.col("nb_label").alias("label_pred"),
            "n_votes",
        )
    )


@register(
    "centroid_classifier_prf",
    f"""
    WITH {_CENTROID_CTE},
    conf AS (
      SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM preds GROUP BY label_true, label_pred
    ),
    tp AS (
      SELECT label_true AS label, n AS tp FROM conf
      WHERE label_true = label_pred
    ),
    n_true AS (
      SELECT label_true AS label, CAST(SUM(n) AS BIGINT) AS n_true
      FROM conf GROUP BY label_true
    ),
    n_pred AS (
      SELECT label_pred AS label, CAST(SUM(n) AS BIGINT) AS n_pred
      FROM conf GROUP BY label_pred
    ),
    base AS (
      SELECT COALESCE(t.label, p.label) AS label,
             CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
             CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
             CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred
      FROM n_true t
      FULL OUTER JOIN n_pred p ON p.label = t.label
      LEFT JOIN tp ON tp.label = COALESCE(t.label, p.label)
    )
    SELECT label, tp,
           CAST(n_pred - tp AS BIGINT) AS fp,
           CAST(n_true - tp AS BIGINT) AS fn,
           CASE WHEN n_pred > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_pred) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN n_true > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_true) AS BIGINT)
           END AS recall_ppm,
           CASE WHEN (2 * tp + (n_pred - tp) + (n_true - tp)) > 0
                THEN CAST(FLOOR(2 * tp * 1000000.0
                           / (2 * tp + (n_pred - tp) + (n_true - tp)))
                          AS BIGINT)
           END AS f1_ppm
    FROM base
    """,
    description="per-label precision/recall/F1 (exact ppm integers) for "
    "the nearest-centroid classifier — the evaluation gate a curation "
    "pipeline thresholds on before trusting a model-based filter; "
    "NULL when a label is never predicted / absent from the split",
    tags=("classify", "embedding", "extension"),
)
def centroid_classifier_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import prf_report

    return prf_report(
        _centroid_preds(spark, sf_dir), "label_true", "label_pred"
    )


@register(
    "lang_classifier_prf",
    f"""
    WITH {_LANG_CTE},
    conf AS (
      SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM lang_preds GROUP BY lang_true, lang_pred
    ),
    tp AS (
      SELECT lang_true AS label, n AS tp FROM conf
      WHERE lang_true = lang_pred
    ),
    n_true AS (
      SELECT lang_true AS label, CAST(SUM(n) AS BIGINT) AS n_true
      FROM conf GROUP BY lang_true
    ),
    n_pred AS (
      SELECT lang_pred AS label, CAST(SUM(n) AS BIGINT) AS n_pred
      FROM conf GROUP BY lang_pred
    ),
    base AS (
      SELECT COALESCE(t.label, p.label) AS label,
             CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
             CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
             CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred
      FROM n_true t
      FULL OUTER JOIN n_pred p ON p.label = t.label
      LEFT JOIN tp ON tp.label = COALESCE(t.label, p.label)
    )
    SELECT label, tp,
           CAST(n_pred - tp AS BIGINT) AS fp,
           CAST(n_true - tp AS BIGINT) AS fn,
           CASE WHEN n_pred > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_pred) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN n_true > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_true) AS BIGINT)
           END AS recall_ppm,
           CASE WHEN (2 * tp + (n_pred - tp) + (n_true - tp)) > 0
                THEN CAST(FLOOR(2 * tp * 1000000.0
                           / (2 * tp + (n_pred - tp) + (n_true - tp)))
                          AS BIGINT)
           END AS f1_ppm
    FROM base
    """,
    description="per-language precision/recall/F1 (exact ppm) for the "
    "fitted lang-id classifier — same prf_report operator as the "
    "centroid variant, over the token-weight model's predictions",
    tags=("classify", "text", "extension"),
)
def lang_classifier_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import prf_report

    return prf_report(_lang_preds(spark, sf_dir), "lang_true", "lang_pred")


@register(
    "classifier_stream_scoring_sim",
    f"WITH {_LANG_CTE} SELECT * FROM lang_preds",
    description="streaming model serving sim: the token-weight model "
    "is fit on the train split and PERSISTED as generation 1 "
    "(streaming/model_store.py — generational store, priors written "
    "last so a partial generation is invisible); the held-out split "
    "streams through the scoring sink in two micro-batches and batch "
    "1 is REPLAYED (batch-id-keyed dynamic partition overwrite — the "
    "repo's effectively-once contract); the prediction store must "
    "hash-equal the all-at-once classifier, proving batch-split "
    "serving and crash-replay leave no trace in the scores",
    tags=("classify", "text", "streaming", "extension"),
)
def classifier_stream_scoring_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from ..streaming.model_store import (
        save_token_model,
        streaming_scoring_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    weights, priors = token_weight_fit(train, "lang")
    tmp = tempfile.mkdtemp(prefix="model_store_")
    save_token_model(spark, f"{tmp}/model", weights, priors, 1)
    sink = streaming_scoring_sink(f"{tmp}/model", f"{tmp}/out")
    sink(test.where(F.col("doc_id") % 10 == 0), 1)
    sink(test.where(F.col("doc_id") % 10 == 5), 2)
    sink(test.where(F.col("doc_id") % 10 == 0), 1)  # crash-replay
    return spark.read.parquet(f"{tmp}/out/preds").select(
        "doc_id", "lang_true", "lang_pred", "score_top"
    )


def _model_branch_cte(pfx: str, train_where: str, test_where: str) -> str:
    """One fitted-model branch (train -> weights/priors -> score a test
    slice) with prefixed CTE names, so two model GENERATIONS coexist in
    one oracle.  Shares the module-level ``occ`` CTE."""
    return f"""
  {pfx}train_occ AS (SELECT * FROM occ WHERE {train_where}),
  {pfx}cnt AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {pfx}train_occ GROUP BY lang, tok
  ),
  {pfx}tot AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot
    FROM {pfx}train_occ GROUP BY lang
  ),
  {pfx}vocab AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM {pfx}train_occ
  ),
  {pfx}weights AS (
    SELECT c.lang, c.tok,
           CAST(FLOOR((c.cnt + 1.0) / (t.tot + v.v) * {QW!r}) AS BIGINT)
             AS w
    FROM {pfx}cnt c JOIN {pfx}tot t ON t.lang = c.lang
    CROSS JOIN {pfx}vocab v
  ),
  {pfx}ndocs AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
    FROM documents WHERE {train_where} GROUP BY lang
  ),
  {pfx}totals AS (
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE {train_where})
                AS BIGINT) AS ntot,
           CAST((SELECT COUNT(*) FROM {pfx}ndocs) AS BIGINT) AS nclasses
  ),
  {pfx}priors AS (
    SELECT lang,
           CAST(FLOOR((nd + 1.0) / (ntot + nclasses) * {QP!r}) AS BIGINT)
             AS prior_w
    FROM {pfx}ndocs CROSS JOIN {pfx}totals
  ),
  {pfx}test_toks AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM occ WHERE {test_where} GROUP BY doc_id, tok
  ),
  {pfx}matched AS (
    SELECT dt.doc_id, w.lang, CAST(SUM(w.w * dt.n_occ) AS BIGINT)
             AS tok_score
    FROM {pfx}test_toks dt JOIN {pfx}weights w ON w.tok = dt.tok
    GROUP BY dt.doc_id, w.lang
  ),
  {pfx}skeleton AS (
    SELECT d.doc_id, d.lang AS lang_true, p.lang, p.prior_w
    FROM documents d CROSS JOIN {pfx}priors p
    WHERE {test_where}
  ),
  {pfx}scored AS (
    SELECT s.doc_id, s.lang_true, s.lang AS lang_pred,
           CAST(s.prior_w + COALESCE(m.tok_score, 0) AS BIGINT) AS score
    FROM {pfx}skeleton s
    LEFT JOIN {pfx}matched m ON m.doc_id = s.doc_id AND m.lang = s.lang
  ),
  {pfx}preds AS (
    SELECT doc_id, lang_true, lang_pred, score AS score_top
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, lang_pred ASC) AS rnk
      FROM {pfx}scored
    ) WHERE rnk = 1
  )"""


@register(
    "model_asof_scoring_sim",
    f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
      FROM documents
    ),{_model_branch_cte("g1", "doc_id % 5 <> 0 AND doc_id % 2 = 0",
                         "doc_id % 10 = 0")},{
        _model_branch_cte("g2", "doc_id % 5 <> 0", "doc_id % 10 = 5")}
    SELECT doc_id, lang_true, lang_pred, score_top,
           CAST(1 AS INT) AS gen FROM g1preds
    UNION ALL
    SELECT doc_id, lang_true, lang_pred, score_top,
           CAST(2 AS INT) AS gen FROM g2preds
    """,
    description="model-version reproducibility under refresh: batch 1 "
    "scores against generation 1 (fit on half the train split), the "
    "model refreshes to generation 2 (full train split), batch 2 "
    "scores against generation 2, and batch 1 is REPLAYED after the "
    "refresh — the marker pin (written FIRST, streaming/model_store.py)"
    " forces the replay back onto generation 1, so the prediction "
    "store equals the per-generation oracle exactly.  Without the pin "
    "a crash-replay racing a refit would silently rescore history "
    "with the wrong model",
    tags=("classify", "text", "streaming", "asof", "extension"),
)
def model_asof_scoring_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.model_store import (
        save_token_model,
        streaming_scoring_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    base_train = docs.where(F.col("doc_id") % 5 != 0)
    tmp = tempfile.mkdtemp(prefix="model_asof_")
    w1, p1 = token_weight_fit(
        base_train.where(F.col("doc_id") % 2 == 0), "lang"
    )
    save_token_model(spark, f"{tmp}/model", w1, p1, 1)
    sink = streaming_scoring_sink(f"{tmp}/model", f"{tmp}/out")
    sink(docs.where(F.col("doc_id") % 10 == 0), 1)
    w2, p2 = token_weight_fit(base_train, "lang")
    save_token_model(spark, f"{tmp}/model", w2, p2, 2)
    sink(docs.where(F.col("doc_id") % 10 == 5), 2)
    sink(docs.where(F.col("doc_id") % 10 == 0), 1)  # replay past refresh
    return spark.read.parquet(f"{tmp}/out/preds").select(
        "doc_id", "lang_true", "lang_pred", "score_top", "gen"
    )


# ---------------------------------------------------------------- #
# feature covariance (PCA / whitening prep)                         #
# ---------------------------------------------------------------- #

_COV_TOPK = 20


@register(
    "embedding_covariance_top",
    f"""
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, i, CAST(FLOOR(x * {QC!r} + 0.5) AS BIGINT) AS qx
      FROM flat
    ),
    n_vecs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
    ),
    s1 AS (SELECT i, CAST(SUM(qx) AS BIGINT) AS s FROM q GROUP BY i),
    s2 AS (
      SELECT a.i AS fi, b.i AS fj,
             CAST(SUM(a.qx * b.qx) AS BIGINT) AS sij
      FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i > a.i
      GROUP BY a.i, b.i
    ),
    cov AS (
      SELECT s2.fi, s2.fj,
             CAST(n.n * s2.sij - sa.s * sb.s AS BIGINT) AS cov_num,
             n.n
      FROM s2
      JOIN s1 sa ON sa.i = s2.fi
      JOIN s1 sb ON sb.i = s2.fj
      CROSS JOIN n_vecs n
    )
    SELECT (fi - 1) AS fi, (fj - 1) AS fj, cov_num, n
    FROM cov
    ORDER BY ABS(cov_num) DESC, fi ASC, fj ASC
    LIMIT {_COV_TOPK}
    """,
    description="feature-covariance prep for PCA/whitening: the top-"
    f"{_COV_TOPK} |covariance| off-diagonal feature pairs as EXACT "
    "integers — cov_num = n*S_ij - S_i*S_j over micro-quantized "
    "components (cov = cov_num / (n^2 * QC^2); the division is left "
    "to the consumer so the relation stays BIGINT-exact).  One "
    "exploded self-join per vector (d^2/2 pairs per row, map-side "
    "combined) — the dense-but-bounded shape; at production dims the "
    "same sums come from a mapInArrow outer-product kernel, but the "
    "RELATION contract (i, j, cov_num, n) is identical",
    tags=("classify", "embedding", "linalg", "extension"),
)
def embedding_covariance_top(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.classify import _qcomp

    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", _qcomp(F.col("x")).alias("qx"))
    n_vecs = emb.agg(F.count("*").cast("long").alias("n"))
    s1 = flat.groupBy("i").agg(F.sum("qx").cast("long").alias("s"))
    a = flat.alias("a")
    b = flat.alias("b")
    s2 = (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id"))
            & (F.col("b.i") > F.col("a.i")),
        )
        .groupBy(F.col("a.i").alias("fi"), F.col("b.i").alias("fj"))
        .agg(
            F.sum(F.col("a.qx") * F.col("b.qx"))
            .cast("long")
            .alias("sij")
        )
    )
    cov = (
        s2.join(s1.select(F.col("i").alias("fi"), F.col("s").alias("sa")), "fi")
        .join(s1.select(F.col("i").alias("fj"), F.col("s").alias("sb")), "fj")
        .crossJoin(F.broadcast(n_vecs))
        .select(
            "fi",
            "fj",
            (F.col("n") * F.col("sij") - F.col("sa") * F.col("sb"))
            .cast("long")
            .alias("cov_num"),
            "n",
        )
    )
    return cov.orderBy(
        F.abs(F.col("cov_num")).desc(), F.asc("fi"), F.asc("fj")
    ).limit(_COV_TOPK)


# ---------------------------------------------------------------- #
# kNN classifier SERVED FROM the persisted IVF-PQ index             #
# ---------------------------------------------------------------- #

def _pq_batch_vote_oracle(query_pred: str, k: int = 5) -> str:
    """The persisted-index batch ADC probe (the proven CTE chain of
    ann_pq_persisted_batch_topk, predicates parametrized) + a majority
    vote over the top-k neighbors' labels."""
    from ..functions.vectors import QV
    from .similarity_queries import _FLAT, _PQ_SUBDIM

    return f"""
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
      WHERE {query_pred.replace('vec_id', 'qf.vec_id')}
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
      FROM (SELECT vec_id, s, i, x FROM psub
            WHERE {query_pred}) qf
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
    ),
    topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY adc_dist ASC, vec_id ASC)
                 AS rank
        FROM adc
      ) WHERE rank <= {k}
    ),
    votes AS (
      SELECT t.qid AS vec_id, e.label AS label_pred,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM topk t JOIN embeddings e ON e.vec_id = t.vec_id
      GROUP BY t.qid, e.label
    )
    SELECT v.vec_id, q.label AS label_true, v.label_pred, v.n_votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id
        ORDER BY n_votes DESC, label_pred ASC) AS vr
      FROM votes
    ) v JOIN embeddings q ON q.vec_id = v.vec_id
    WHERE v.vr = 1
    """


@register(
    "knn_classifier_ivf_report",
    _pq_batch_vote_oracle(f"vec_id % 5 = 0 AND vec_id < {EVAL_CAP}"),
    description="the kNN classifier's 100 TB SERVING shape made real: "
    "the eval batch classifies by majority label of its top-5 ADC "
    "neighbors from the PERSISTED IVF-PQ index — one dynamic-"
    "partition-pruned codes scan serves the whole batch (nprobe=2), "
    "so per-batch cost is the touched lists' codes, never the corpus; "
    "the oracle replays encode + assignment + per-qid coarse ranking "
    "+ ADC + vote bit-for-bit (vote ties to the smaller label, "
    "distance ties to the smaller vec_id)",
    tags=("classify", "similarity", "ann", "pq", "ivf", "index",
          "extension"),
)
def knn_classifier_ivf_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.ann_index import pq_batch_probe_topk
    from .similarity_queries import _ensure_pq_index

    path = _ensure_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < EVAL_CAP)
    ).select(F.col("vec_id").alias("qid"), "embedding")
    topk = pq_batch_probe_topk(spark, path, queries, 5, nprobe=2)
    labeled = topk.join(
        emb.select("vec_id", F.col("label").alias("label_pred")), "vec_id"
    )
    votes = labeled.groupBy("qid", "label_pred").agg(
        F.count("*").cast("long").alias("n_votes")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.desc("n_votes"), F.asc("label_pred")
    )
    truth = emb.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("label_true")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .join(truth, "qid")
        .select(
            F.col("qid").alias("vec_id"),
            "label_true",
            "label_pred",
            "n_votes",
        )
    )


from .graph_queries import _pagerank_ctes  # noqa: E402


@register(
    "curation_v2_pipeline",
    f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
      FROM documents
    ),{_model_branch_cte("m", "doc_id % 5 <> 0", "TRUE")},{_pagerank_ctes()},
    ranks AS (
      SELECT source, CAST(r AS BIGINT) AS rank_micro FROM rank5
    ),
    total AS (
      SELECT CAST(SUM(rank_micro) AS BIGINT) AS total_rank FROM ranks
    ),
    quotas AS (
      SELECT r.source, r.rank_micro,
             CAST(FLOOR(r.rank_micro * 100.0 / t.total_rank) AS BIGINT)
               AS quota
      FROM ranks r CROSS JOIN total t
    ),
    picked AS (
      SELECT d.doc_id, d.source, q.rank_micro, q.quota,
             ROW_NUMBER() OVER (
               PARTITION BY d.source ORDER BY d.doc_id ASC) AS rn
      FROM documents d JOIN quotas q ON q.source = d.source
    ),
    sampled AS (
      SELECT doc_id, source, rank_micro FROM picked WHERE rn <= quota
    )
    SELECT s.doc_id, s.source, s.rank_micro, p.lang_true, p.lang_pred
    FROM sampled s JOIN mpreds p ON p.doc_id = s.doc_id
    WHERE p.lang_pred = p.lang_true
    """,
    description="curation pipeline v2 — the round-12 families composed "
    "into one plan: documents are sampled by PageRank-proportional "
    "per-source quotas (the measured domain mix), then gated by "
    "fitted-classifier SELF-AGREEMENT (keep docs whose token-weight "
    "lang prediction matches their labeled lang — the model-based "
    "quality filter applied corpus-wide, train split scored too).  "
    "One declarative plan: graph edges, 5 rank iterations, model fit, "
    "corpus scoring, quota sampling and the agreement gate all under "
    "Catalyst, every number integer-exact",
    tags=("classify", "graph", "curation", "pipeline", "extension"),
)
def curation_v2_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .graph_queries import _ensure_rank_store

    docs = load_table(spark, sf_dir, "documents")
    # authority quotas from the persisted rank store (built once per
    # process — the scheduled-artifact shape; see graph_queries)
    ranks = spark.read.parquet(
        _ensure_rank_store(spark, sf_dir)
    ).select("source", "rank_micro")
    total = ranks.agg(
        F.sum("rank_micro").cast("long").alias("total_rank")
    )
    quotas = ranks.crossJoin(F.broadcast(total)).select(
        "source",
        "rank_micro",
        F.floor(
            F.col("rank_micro") * F.lit(100.0) / F.col("total_rank")
        )
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    sampled = (
        docs.select("doc_id", "source")
        .join(quotas, "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "rank_micro")
    )
    # corpus-wide classifier scoring (train split scored too)
    weights, priors = token_weight_fit(
        docs.where(F.col("doc_id") % 5 != 0), "lang"
    )
    preds = token_weight_classify(docs, weights, priors, "lang")
    return (
        sampled.join(preds, "doc_id")
        .where(F.col("lang_pred") == F.col("lang_true"))
        .select("doc_id", "source", "rank_micro", "lang_true", "lang_pred")
    )


def _pca_power_ctes(n_iter: int) -> str:
    """Full integer covariance matrix -> scaled matrix -> n_iter
    unrolled power steps (operators/linalg.py twin).  MATERIALIZED:
    the matrix and each step vector are referenced twice (product +
    max-abs rescale) and would inline exponentially otherwise."""
    head = f"""
    pflat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    pq AS MATERIALIZED (
      SELECT vec_id, i,
             CAST(FLOOR(x * {QC_COV!r} + 0.5) AS BIGINT) AS qx
      FROM pflat
    ),
    pnv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    ps1 AS MATERIALIZED (
      SELECT i, CAST(SUM(qx) AS BIGINT) AS s FROM pq GROUP BY i
    ),
    ps2 AS MATERIALIZED (
      SELECT a.i AS fi, b.i AS fj,
             CAST(SUM(a.qx * b.qx) AS BIGINT) AS sij
      FROM pq a JOIN pq b ON b.vec_id = a.vec_id
      GROUP BY a.i, b.i
    ),
    pcov AS MATERIALIZED (
      SELECT s2.fi, s2.fj,
             CAST(n.n * s2.sij - sa.s * sb.s AS BIGINT) AS cov_num
      FROM ps2 s2
      JOIN ps1 sa ON sa.i = s2.fi
      JOIN ps1 sb ON sb.i = s2.fj
      CROSS JOIN pnv n
    ),
    pm AS MATERIALIZED (
      SELECT fi, fj,
             CAST(FLOOR(CAST(cov_num AS DOUBLE) * 1000000.0
                        / CAST(ma AS DOUBLE)) AS BIGINT) AS m
      FROM pcov CROSS JOIN (
        SELECT CAST(MAX(ABS(cov_num)) AS BIGINT) AS ma FROM pcov)
    ),
    pv0 AS MATERIALIZED (
      SELECT DISTINCT fi AS j, CAST(1000000 AS BIGINT) AS v FROM pm
    )"""
    blocks = [head]
    for t in range(1, n_iter + 1):
        blocks.append(f"""
    pu{t} AS MATERIALIZED (
      SELECT m.fi, CAST(SUM(m.m * v.v) AS BIGINT) AS u
      FROM pm m JOIN pv{t - 1} v ON v.j = m.fj
      GROUP BY m.fi
    ),
    pv{t} AS MATERIALIZED (
      SELECT fi AS j,
             CAST(FLOOR(CAST(u AS DOUBLE) * 1000000.0
                        / CAST(um AS DOUBLE)) AS BIGINT) AS v
      FROM pu{t} CROSS JOIN (
        SELECT CAST(MAX(ABS(u)) AS BIGINT) AS um FROM pu{t})
    )""")
    return ",".join(blocks)


_N_POWER = 4


@register(
    "pca_power_loadings",
    f"""
    WITH {_pca_power_ctes(_N_POWER)}
    SELECT CAST(j - 1 AS INTEGER) AS fi, v AS loading
    FROM pv{_N_POWER}
    ORDER BY fi ASC
    """,
    description="dominant principal component by POWER ITERATION "
    f"({_N_POWER} fixed steps) over the full exact-integer covariance "
    "matrix (the PCA/whitening/OPQ-rotation prep an embedding "
    "pipeline runs after embedding_covariance_top's diagnostic): "
    "v0 = all-ones, each step is u = Mv then a max-abs integer "
    "rescale.  The normalization chain runs in IEEE doubles on "
    "exact-integer-valued inputs (< 2^53), so both engines produce "
    "bit-identical loadings even where the math rounds.  The matrix "
    "build is one exploded self-join per vector (d^2 products, "
    "map-side combined, d x d output regardless of corpus size); "
    "each power step joins d^2 rows against a d-row vector",
    tags=("classify", "embedding", "linalg", "iterative", "extension"),
)
def pca_power_loadings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import (
        covariance_matrix,
        power_iteration,
        scaled_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    m = scaled_matrix(covariance_matrix(emb))
    return power_iteration(m, _N_POWER).select(
        F.col("fi").cast("int").alias("fi"), "loading"
    ).orderBy("fi")


@register(
    "pca_stratified_sample",
    f"""
    WITH {_pca_power_ctes(_N_POWER)},
    pproj AS MATERIALIZED (
      SELECT f.vec_id, CAST(SUM(f.qx * v.v) AS BIGINT) AS proj
      FROM pq f JOIN pv{_N_POWER} v ON v.j = f.i
      GROUP BY f.vec_id
    ),
    pdec AS (
      SELECT vec_id, proj,
             CAST(NTILE(10) OVER (ORDER BY proj ASC, vec_id ASC)
                  AS INTEGER) AS decile
      FROM pproj
    )
    SELECT vec_id, decile, proj FROM (
      SELECT vec_id, decile, proj,
             ROW_NUMBER() OVER (PARTITION BY decile
               ORDER BY vec_id ASC) AS rn
      FROM pdec)
    WHERE rn <= 3
    ORDER BY decile ASC, vec_id ASC
    """,
    description="PCA-stratified diversity sampling (the 1-d embedding-"
    "space analogue of the cluster-quota samplers): every vector "
    "projects onto the power-iterated dominant component (exact "
    "BIGINT dot of micro-quantized coords x integer loadings), the "
    "projection axis splits into 10 exact-NTILE strata, and each "
    "stratum contributes its 3 lowest vec_ids — coverage across the "
    "direction of maximum variance instead of around cluster modes.  "
    "Scale shape (r13, replacing a corpus-wide unpartitioned ntile "
    "window): exact global ranks come from the two-level distributed "
    "pattern — range-repartition on (proj, vec_id), per-partition "
    "local row_number (window PARTITIONED by spark_partition_id, so "
    "it distributes), plus broadcast per-partition offsets from a "
    "partition-count triangle join (P^2 rows, P = shuffle "
    "parallelism); the NTILE bucket is then pure integer arithmetic "
    "on (rank, N), bit-identical to the oracle's NTILE(10)",
    tags=("classify", "embedding", "linalg", "sampling", "extension"),
)
def pca_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.linalg import (
        _qcomp,
        covariance_matrix,
        power_iteration,
        scaled_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    loadings = power_iteration(
        scaled_matrix(covariance_matrix(emb)), _N_POWER
    )
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", _qcomp(F.col("x")).alias("qx"))
    proj = (
        flat.join(
            F.broadcast(loadings.select(F.col("fi").alias("i"), "loading")),
            "i",
        )
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("qx") * F.col("loading"))
            .cast("long")
            .alias("proj")
        )
    )
    # Exact global rank by (proj, vec_id) WITHOUT a single-partition
    # window: range-partition orders partitions globally, the local
    # row_number windows per partition id (distributed), and each
    # partition's offset is the summed count of the partitions before
    # it (tiny triangle self-join, broadcast back).
    # localCheckpoint pins ONE materialized pid assignment: the count
    # branch and the rank branch below must see identical partitioning
    # (range-partition boundary sampling may differ across plan
    # re-evaluations).
    parts = (
        proj.repartitionByRange(F.asc("proj"), F.asc("vec_id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = parts.withColumn(
        "lrn",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(
                F.asc("proj"), F.asc("vec_id")
            )
        ),
    )
    pc = parts.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("pn")
    )
    off = (
        pc.alias("a")
        .join(pc.alias("b"), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.pn"), F.lit(0)).alias("poff"))
    )
    n_tot = proj.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    ranked = (
        local.join(F.broadcast(off), "pid")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("rank", F.col("poff") + F.col("lrn"))
    )
    # NTILE(10) as exact integer arithmetic on (rank, N): the first
    # N % 10 buckets hold floor(N/10)+1 rows, the rest floor(N/10).
    base = F.floor(F.col("n_tot") / 10).cast("long")
    rem = (F.col("n_tot") % 10).cast("long")
    big = rem * (base + 1)  # rows covered by the size-(base+1) buckets
    dec = ranked.withColumn(
        "decile",
        F.when(
            F.col("rank") <= big,
            F.floor((F.col("rank") - 1) / (base + 1)) + 1,
        )
        .otherwise(
            rem + F.floor((F.col("rank") - 1 - big) / base) + 1
        )
        .cast("int"),
    )
    w = Window.partitionBy("decile").orderBy(F.asc("vec_id"))
    return (
        dec.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("vec_id", "decile", "proj")
        .orderBy("decile", "vec_id")
    )


# ---------------------------------------------------------------- #
# classifier drift -> refit loop (round 13)                         #
# ---------------------------------------------------------------- #

# The drift scenario: the frozen generation was fitted BEFORE a new
# language entered the stream (its train slice excludes 'zh'), so it
# can never predict that label on current traffic — the realistic
# staleness mode of a model-based curation filter.  The report
# quantifies it; the sim closes the loop by letting the measured
# decision drive a generational refit under the marker-gated store.
_DRIFT_NEW_LANG = "zh"
_FZ_TRAIN = f"doc_id % 5 <> 0 AND lang <> '{_DRIFT_NEW_LANG}'"
_FR_TRAIN = "doc_id % 5 <> 0"


def _sql_prf(pfx: str) -> str:
    """Per-label PRF CTE chain over ``{pfx}preds`` (the SQL twin of
    operators/classify.prf_report), ending at ``{pfx}prf`` plus the
    stage micro-accuracy ``{pfx}acc``."""
    return f"""
  {pfx}conf AS (
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM {pfx}preds GROUP BY lang_true, lang_pred
  ),
  {pfx}tp AS (
    SELECT lang_true AS label, n AS tp FROM {pfx}conf
    WHERE lang_true = lang_pred
  ),
  {pfx}n_true AS (
    SELECT lang_true AS label, CAST(SUM(n) AS BIGINT) AS n_true
    FROM {pfx}conf GROUP BY lang_true
  ),
  {pfx}n_pred AS (
    SELECT lang_pred AS label, CAST(SUM(n) AS BIGINT) AS n_pred
    FROM {pfx}conf GROUP BY lang_pred
  ),
  {pfx}base AS (
    SELECT COALESCE(t.label, p.label) AS label,
           CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
           CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
           CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred
    FROM {pfx}n_true t
    FULL OUTER JOIN {pfx}n_pred p ON p.label = t.label
    LEFT JOIN {pfx}tp tp ON tp.label = COALESCE(t.label, p.label)
  ),
  {pfx}prf AS (
    SELECT label, tp,
           CAST(n_pred - tp AS BIGINT) AS fp,
           CAST(n_true - tp AS BIGINT) AS fn,
           CASE WHEN n_pred > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_pred) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN n_true > 0
                THEN CAST(FLOOR(tp * 1000000.0 / n_true) AS BIGINT)
           END AS recall_ppm,
           CASE WHEN (2 * tp + (n_pred - tp) + (n_true - tp)) > 0
                THEN CAST(FLOOR(2 * tp * 1000000.0
                           / (2 * tp + (n_pred - tp) + (n_true - tp)))
                          AS BIGINT)
           END AS f1_ppm
    FROM {pfx}base
  ),
  {pfx}acc AS (
    SELECT CAST(FLOOR(SUM(CASE WHEN lang_true = lang_pred
                               THEN 1 ELSE 0 END) * 1000000.0
                      / COUNT(*)) AS BIGINT) AS acc_ppm
    FROM {pfx}preds
  )"""


def _stage_prf(preds: DataFrame, stage: str) -> DataFrame:
    """prf_report rows + the stage micro-accuracy column (1-row
    broadcast side, constant by construction)."""
    from ..operators.classify import prf_report

    rep = prf_report(preds, "lang_true", "lang_pred")
    acc = preds.agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("lang_true") == F.col("lang_pred"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            * F.lit(1_000_000.0)
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("acc_ppm")
    )
    return rep.crossJoin(F.broadcast(acc)).select(
        F.lit(stage).alias("stage"),
        "label",
        "tp",
        "fp",
        "fn",
        "precision_ppm",
        "recall_ppm",
        "f1_ppm",
        "acc_ppm",
    )


@register(
    "classifier_drift_report",
    f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
      FROM documents
    ),{_model_branch_cte("fz", _FZ_TRAIN, "doc_id % 5 = 0")},{
        _model_branch_cte("fr", _FR_TRAIN, "doc_id % 5 = 0")},
    {_sql_prf("fz")},
    {_sql_prf("fr")},
    flag AS (
      SELECT (fr.acc_ppm > fz.acc_ppm) AS refit_needed
      FROM fracc fr CROSS JOIN fzacc fz
    )
    SELECT 'frozen' AS stage, p.*, a.acc_ppm, f.refit_needed
    FROM fzprf p CROSS JOIN fzacc a CROSS JOIN flag f
    UNION ALL
    SELECT 'fresh' AS stage, p.*, a.acc_ppm, f.refit_needed
    FROM frprf p CROSS JOIN fracc a CROSS JOIN flag f
    """,
    description="model-staleness monitor for the classifier family "
    "(the quantizer/k-means drift loop applied to classify — round-12 "
    "verdict item 7): the FROZEN generation was fitted before a new "
    f"language ('{_DRIFT_NEW_LANG}') entered the corpus; both it and "
    "a shadow FRESH fit score the same held-out slice, and the report "
    "carries per-label PRF per stage, each stage's micro-accuracy, "
    "and the refit decision (fresh beats frozen).  All exact ppm "
    "integers — the threshold gate a scheduled refit job reads.  "
    "Scale: two fits + two scoring passes, every aggregate "
    "count-shaped and map-side combined; models broadcast",
    tags=("classify", "text", "evaluation", "extension"),
)
def classifier_drift_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    wf, pf = token_weight_fit(
        train.where(F.col("lang") != _DRIFT_NEW_LANG), "lang"
    )
    wn, pn = token_weight_fit(train, "lang")
    frozen = token_weight_classify(test, wf, pf, "lang")
    fresh = token_weight_classify(test, wn, pn, "lang")
    fz = _stage_prf(frozen, "frozen")
    fr = _stage_prf(fresh, "fresh")
    flag = (
        fr.select("acc_ppm")
        .distinct()
        .crossJoin(
            F.broadcast(
                fz.select(F.col("acc_ppm").alias("fz_acc")).distinct()
            )
        )
        .select(
            (F.col("acc_ppm") > F.col("fz_acc")).alias("refit_needed")
        )
    )
    return fz.unionByName(fr).crossJoin(F.broadcast(flag))


@register(
    "classifier_refit_sim",
    f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok
      FROM documents
    ),{_model_branch_cte("b1", _FZ_TRAIN, "doc_id % 10 = 0")},{
        _model_branch_cte("sh", _FR_TRAIN, "doc_id % 10 = 0")},{
        _model_branch_cte("s2", _FR_TRAIN, "doc_id % 10 = 5")},{
        _model_branch_cte("e2", _FZ_TRAIN, "doc_id % 10 = 5")},
    decision AS (
      SELECT (
        (SELECT COUNT(*) FROM shpreds WHERE lang_true = lang_pred)
        >
        (SELECT COUNT(*) FROM b1preds WHERE lang_true = lang_pred)
      ) AS refit
    )
    SELECT doc_id, lang_true, lang_pred, score_top,
           CAST(1 AS INT) AS gen FROM b1preds
    UNION ALL
    SELECT p.doc_id, p.lang_true, p.lang_pred, p.score_top,
           CAST(2 AS INT) AS gen
    FROM s2preds p CROSS JOIN decision d WHERE d.refit
    UNION ALL
    SELECT p.doc_id, p.lang_true, p.lang_pred, p.score_top,
           CAST(1 AS INT) AS gen
    FROM e2preds p CROSS JOIN decision d WHERE NOT d.refit
    """,
    description="the drift DECISION driving a generational refit under "
    "the marker-gated model store: batch 1 scores on the frozen "
    "generation (fitted pre-'zh'); the drift monitor then compares a "
    "shadow fresh fit against the frozen model ON THE SERVED BATCH "
    "(exact correct-count integers) and, because fresh wins, commits "
    "generation 2; batch 2 scores on generation 2; batch 1 REPLAYS "
    "after the refit and the marker pin keeps it on generation 1.  "
    "The prediction store hash-equals an oracle that replays the same "
    "decision rule as a CASE over both branches — closing the "
    "measure->refit->serve loop the clustering family already has "
    "(kmeans_refit_sim)",
    tags=("classify", "text", "streaming", "incremental", "extension"),
)
def classifier_refit_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.model_store import (
        save_token_model,
        streaming_scoring_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    b1 = docs.where(F.col("doc_id") % 10 == 0)
    b2 = docs.where(F.col("doc_id") % 10 == 5)
    w1, p1 = token_weight_fit(
        train.where(F.col("lang") != _DRIFT_NEW_LANG), "lang"
    )
    tmp = tempfile.mkdtemp(prefix="model_refit_")
    save_token_model(spark, f"{tmp}/model", w1, p1, 1)
    sink = streaming_scoring_sink(f"{tmp}/model", f"{tmp}/out")
    sink(b1, 1)
    # drift monitor on the served batch: frozen correct-count vs a
    # shadow fresh fit (1-row decision collect — request-bounded)
    w2, p2 = token_weight_fit(train, "lang")

    def _correct(preds: DataFrame) -> int:
        return (
            preds.where(F.col("lang_true") == F.col("lang_pred"))
            .count()
        )

    frozen_ok = _correct(token_weight_classify(b1, w1, p1, "lang"))
    fresh_ok = _correct(token_weight_classify(b1, w2, p2, "lang"))
    if fresh_ok > frozen_ok:
        save_token_model(spark, f"{tmp}/model", w2, p2, 2)
    sink(b2, 2)
    sink(b1, 1)  # replay past the refit: marker pins generation 1
    return spark.read.parquet(f"{tmp}/out/preds").select(
        "doc_id", "lang_true", "lang_pred", "score_top", "gen"
    )
