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
