"""Text-analysis operators for training-data pipelines (north-star
surface): quality profiling, heuristic language ID, regex tokenization,
and winnowing document fingerprints.

All column work is built-in Spark functions (split/filter/transform/
aggregate/regexp) — JVM-side, codegen-friendly, no Python UDFs.  Each
has an exact DuckDB twin in plans/text_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_half_up
from ..functions.hashing import shingles, tokens

STOPWORDS = ("the", "a", "of", "and", "to", "in")
PUNCT_CLASS = "[.,;:!?]"
# BPE-ish tokenizer: letter runs, digit runs, single other non-space.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "los"),
    "fr": ("le", "une", "des"),
    "de": ("der", "die", "und"),
    "zh": ("de", "shi", "bu"),
}
LANG_ORDER = tuple(LANG_MARKERS)  # tie-break: first in this order wins


def quality_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics: token/char counts, mean token length,
    punctuation ratio, stopword ratio, and a blended quality score."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    avg_token_len = sum_tok_len.cast("double") / n_tokens.cast("double")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), PUNCT_CLASS, "")
    )
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    stopword_ratio = n_stop.cast("double") / n_tokens.cast("double")
    quality = round_half_up(
        F.lit(0.5) * (F.least(n_tokens, F.lit(100)).cast("double") / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * stopword_ratio,
        6,
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic n-gram/stopword language ID: marker-token hit counts
    per language, argmax with deterministic first-wins tie-break."""
    toks = tokens(F.col(text_col))
    score_cols = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(
            f"s_{lang}"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", F.col("lang").alias("lang_true"), *score_cols.values())
    pred = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else cond & c
        branch = F.when(cond, F.lit(lang))
        pred = branch if pred is None else pred.when(cond, F.lit(lang))
    # F.when chain: first matching lang in LANG_ORDER wins.
    return scored.withColumn("lang_pred", pred)


def regex_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts under the BPE-ish regex tokenizer."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", window: int = 4
) -> DataFrame:
    """Winnowing (rolling-min) fingerprints: min shingle-md5 per sliding
    position window; a doc's fingerprint set is the distinct mins.
    Returns per-doc fingerprint count and the lexicographic min."""
    from pyspark.sql import Window as W

    toked = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    sh = toked.select(
        "doc_id",
        F.posexplode(shingles(F.col("toks"))).alias("pos", "shingle"),
    ).withColumn("h", F.md5(F.col("shingle")))
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    return (
        sh.withColumn("wmin", F.min("h").over(w))
        .where(F.col("pos") >= window - 1)  # full windows only
        .groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("wmin")).alias("n_fingerprints"),
            F.min("wmin").alias("min_fingerprint"),
        )
    )
