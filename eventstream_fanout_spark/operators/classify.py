"""Trained classifier scoring for training-data curation.

Two deterministic, cross-engine-exact classifiers — the "model-based
quality/language filter" stage of an LLM data pipeline (the heuristic
stages live in operators/text_analysis.py; these are their *fitted*
counterparts, fastText-style in role but built entirely from exact
integer arithmetic so a DuckDB oracle reproduces every score
bit-for-bit):

- **Nearest-centroid embedding classifier** — fit one centroid per
  label on a train split of ``embeddings``, classify the held-out
  split by integer dot-product with the quantized centroids.
- **Smoothed token-weight voting classifier** — a multinomial-Naive-
  Bayes-shaped model over document tokens.  Textbook NB sums
  ``log`` likelihoods, but ``ln`` is not IEEE-correctly-rounded and
  a float log-sum is order-dependent, so cross-engine value hashing
  would be flaky; instead each (class, token) carries an integer
  weight ``floor((cnt+1)/(tot+V) * 1e12)`` (single correctly-rounded
  division of exact integers — bit-identical in Spark and DuckDB)
  and scoring is an exact BIGINT sum of weights over the document's
  token occurrences plus an integer prior.  Same decision structure,
  hash-stable by construction.

Scale design (100 TB): the fitted model is tiny relative to the corpus
(labels × dim centroids; classes × vocab token weights).  Fitting is
one partial-aggregated ``groupBy`` over the train split; scoring joins
the corpus against the broadcast centroid table (embeddings) or
shuffle-joins exploded token counts against the weight table keyed by
token (documents) — no all-pairs work, no Python in the hot path.

Overflow bounds are documented per function; every sum stays far
inside BIGINT at any realistic scale.

Reference parity note: /root/reference has no model surface; this is
north-star pipeline scope (SURVEY.md §2 extension inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import tokens

# Component quantization for centroid math.  |x| < 1 for the testdata
# embeddings, so |q| <= 1e6; centroid values are floor(mean) of those,
# and a 64-dim score sum is bounded by 64 * (1e6)^2 ~ 6.4e13 << 2^63.
QC = 1_000_000.0

# Token-weight quantization: (cnt+1)/(tot+V) <= 1, so each weight is
# <= 1e12; a document of 1e6 token occurrences still sums < 1e18 < 2^63.
QW = 1_000_000_000_000.0

# Prior quantization (nano-units; priors are <= 1 by construction).
QP = 1_000_000_000.0


def _qcomp(x) -> F.Column:
    """Quantize one embedding component to integer micro-units."""
    return F.floor(x.cast("double") * F.lit(QC) + F.lit(0.5)).cast("long")


def centroid_fit(train: DataFrame) -> DataFrame:
    """Fit integer centroids: one row per (label, i) with
    ``c = floor(sum(q(x)) / n_label)``.

    ``sum(q(x))`` is an exact BIGINT; the divide is one
    correctly-rounded IEEE op on integers (exact while
    ``n_label * QC * max|x| < 2^53`` — ~9e9 train rows per label at
    this embedding scale), so the floor is engine-independent.
    """
    flat = train.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    )
    sums = flat.groupBy("label", "i").agg(
        F.sum(_qcomp(F.col("x"))).alias("s")
    )
    n_by_label = train.groupBy("label").agg(F.count("*").alias("n"))
    return sums.join(n_by_label, "label").select(
        "label",
        "i",
        F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("c"),
    )


def centroid_classify(test: DataFrame, centroids: DataFrame) -> DataFrame:
    """Classify each test vector by max integer dot with the centroids.

    The centroid table is labels x dim rows — broadcast; the corpus
    side is one exploded pass with partial aggregation, so the plan is
    scan + broadcast join + two-level agg at any corpus size.  Ties
    break to the smaller label.

    Returns (vec_id, label_true, label_pred, score_top).
    """
    flat = test.select(
        "vec_id",
        F.col("label").alias("label_true"),
        F.posexplode("embedding").alias("i", "x"),
    )
    scored = (
        flat.join(F.broadcast(centroids), "i")
        .groupBy("vec_id", "label_true", F.col("label").alias("label_pred"))
        .agg(F.sum(F.col("c") * _qcomp(F.col("x"))).alias("score"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("score"), F.asc("label_pred")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "vec_id",
            "label_true",
            "label_pred",
            F.col("score").alias("score_top"),
        )
    )


def token_weight_fit(train_docs: DataFrame, class_col: str) -> DataFrame:
    """Fit the (class, token) weight table + per-class integer prior.

    cnt  = occurrences of token in the class's train docs
    tot  = total token occurrences in the class
    V    = train vocabulary size (shared across classes)
    w    = floor((cnt + 1.0) / (tot + V) * QW)         -- BIGINT
    prior= floor((n_docs_class + 1.0)
                 / (n_docs_train + n_classes) * QP)    -- BIGINT

    Both divides are single correctly-rounded IEEE ops on exact
    integers, so the floors match any engine computing the same
    expression.  Returns two DataFrames' worth of model as a tuple.
    """
    occ = train_docs.select(
        class_col, F.explode(tokens(F.col("text"))).alias("tok")
    )
    cnt = occ.groupBy(class_col, "tok").agg(F.count("*").alias("cnt"))
    tot = occ.groupBy(class_col).agg(F.count("*").alias("tot"))
    vocab = occ.agg(F.countDistinct("tok").alias("v"))
    weights = (
        cnt.join(tot, class_col)
        .crossJoin(F.broadcast(vocab))
        .select(
            class_col,
            "tok",
            F.floor(
                (F.col("cnt") + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
                * F.lit(QW)
            )
            .cast("long")
            .alias("w"),
        )
    )
    n_docs = train_docs.groupBy(class_col).agg(F.count("*").alias("nd"))
    totals = train_docs.agg(
        F.count("*").alias("ntot")
    ).crossJoin(n_docs.agg(F.count("*").alias("nclasses")))
    priors = n_docs.crossJoin(F.broadcast(totals)).select(
        class_col,
        F.floor(
            (F.col("nd") + F.lit(1.0))
            / (F.col("ntot") + F.col("nclasses"))
            * F.lit(QP)
        )
        .cast("long")
        .alias("prior_w"),
    )
    return weights, priors


def token_weight_classify(
    test_docs: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    class_col: str,
) -> DataFrame:
    """Score every (doc, class) pair and keep the argmax class.

    The doc side is pre-aggregated to (doc_id, tok, n_occ) so the join
    against the weight table moves one row per distinct token, not one
    per occurrence (map-side combine first — the 100 TB shape).  Docs
    whose tokens are all unseen for a class still get the class's
    prior via the doc x class skeleton.  Ties break to the smaller
    class value.

    Returns (doc_id, true_<class>, pred_<class>, score_top).
    """
    true_col = f"{class_col}_true"
    pred_col = f"{class_col}_pred"
    doc_toks = (
        test_docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n_occ"))
    )
    matched = (
        doc_toks.join(weights, "tok")
        .groupBy("doc_id", class_col)
        .agg(F.sum(F.col("w") * F.col("n_occ")).alias("tok_score"))
    )
    skeleton = test_docs.select(
        "doc_id", F.col(class_col).alias(true_col)
    ).crossJoin(F.broadcast(priors))
    scored = skeleton.join(matched, ["doc_id", class_col], "left").select(
        "doc_id",
        true_col,
        F.col(class_col).alias(pred_col),
        (
            F.col("prior_w")
            + F.coalesce(F.col("tok_score"), F.lit(0).cast("long"))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc(pred_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "doc_id", true_col, pred_col, F.col("score").alias("score_top")
        )
    )


def confusion_matrix(
    preds: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """(true, pred, n) counts — the aggregate evaluation view."""
    return preds.groupBy(true_col, pred_col).agg(
        F.count("*").cast("long").alias("n")
    )


def prf_report(
    preds: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision/recall/F1 in exact ppm integers.

    precision_ppm = floor(tp * 1e6 / n_pred)   (NULL when never predicted)
    recall_ppm    = floor(tp * 1e6 / n_true)   (NULL when class absent)
    f1_ppm        = floor(2 * tp * 1e6 / (2*tp + fp + fn))
                    (NULL when the denominator is 0)

    Every number derives from BIGINT counts with one correctly-rounded
    divide, so a SQL oracle reproduces it exactly.  The input is the
    per-row prediction relation; all aggregation is count-shaped
    (map-side combined), so the report costs one pass at any corpus
    size.
    """
    conf = preds.groupBy(
        F.col(true_col), F.col(pred_col)
    ).agg(F.count("*").cast("long").alias("n"))
    tp = (
        conf.where(F.col(true_col) == F.col(pred_col))
        .select(F.col(true_col).alias("label"), F.col("n").alias("tp"))
    )
    n_true = conf.groupBy(F.col(true_col).alias("label")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    n_pred = conf.groupBy(F.col(pred_col).alias("label")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    base = (
        n_true.join(n_pred, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0).cast("long")).alias("tp"),
            F.coalesce("n_true", F.lit(0).cast("long")).alias("n_true"),
            F.coalesce("n_pred", F.lit(0).cast("long")).alias("n_pred"),
        )
    )
    ppm = F.lit(1_000_000.0)
    fp = F.col("n_pred") - F.col("tp")
    fn = F.col("n_true") - F.col("tp")
    return base.select(
        "label",
        "tp",
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.when(
            F.col("n_pred") > 0,
            F.floor(F.col("tp") * ppm / F.col("n_pred")).cast("long"),
        ).alias("precision_ppm"),
        F.when(
            F.col("n_true") > 0,
            F.floor(F.col("tp") * ppm / F.col("n_true")).cast("long"),
        ).alias("recall_ppm"),
        F.when(
            (F.lit(2) * F.col("tp") + fp + fn) > 0,
            F.floor(
                F.lit(2) * F.col("tp") * ppm
                / (F.lit(2) * F.col("tp") + fp + fn)
            ).cast("long"),
        ).alias("f1_ppm"),
    )
