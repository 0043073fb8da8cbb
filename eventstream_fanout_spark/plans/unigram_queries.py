"""Unigram-LM (SentencePiece-style) tokenizer trainer queries.

The oracles replay the identical integer Viterbi DP CTE-for-CTE
(operators/unigram.py generates both sides from the same constants),
so hashes pin the segmentation semantics exactly — including the
argmin tie-breaks and the prune thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_tokens
from ..operators.unigram import (
    piece_usage,
    sql_unigram_ctes,
    unigram_train_tables,
)
from ..sources.tables import dataset_cache_key, load_table
from .registry import register

# Fitted round-2 artifacts, built ONCE per (process, sf_dir) — the
# production shape: a tokenizer is a scheduled training artifact its
# consumers read, not something every query re-derives (the
# rank-store / trained-BPE-store amortization pattern).
_SEG_CACHE: dict[str, str] = {}


def _ensure_segmentation(spark: SparkSession, sf_dir: str) -> str:
    key = dataset_cache_key(sf_dir)
    path = _SEG_CACHE.get(key)
    if path is None:
        import tempfile

        docs = load_table(spark, sf_dir, "documents").select("text")
        _seed, _u1, _p2, emit2 = unigram_train_tables(docs)
        path = tempfile.mkdtemp(prefix="unigram_store_")
        emit2.write.mode("overwrite").parquet(f"{path}/emit2")
        _SEG_CACHE[key] = path
    return path


@register(
    "unigram_train_iterative",
    f"""
    WITH {sql_unigram_ctes()}
    SELECT u.piece, CAST(length(u.piece) AS BIGINT) AS piece_len,
           u.usage, CAST(COALESCE(p.usage, 0) AS BIGINT) AS usage_prev
    FROM ug_usage2 u
    LEFT JOIN ug_usage1 p ON p.piece = u.piece
    ORDER BY u.usage DESC, u.piece ASC
    LIMIT 30
    """,
    description="the REAL unigram-LM tokenizer trainer (Kudo 2018 / "
    "the SentencePiece default — the top-down complement of "
    "bpe_train_iterative): seed every <=4-char substring of the "
    "<=12-char vocabulary, Viterbi-segment every word under an "
    "integer-exact fewest-pieces-then-highest-score objective "
    "(cost = n*10^15 - sum(score): probability maximization as "
    "BIGINT lexicographic minimization — no logs, no cross-engine "
    "ulp risk), re-estimate scores from segmentation usage (hard-EM "
    "M-step), prune multi-char pieces under the usage floor, and "
    "segment again.  Top-30 surviving pieces with round-2 vs round-1 "
    "usage.  After one corpus-sized word count every stage is "
    "VOCAB-sized; the DP (12 layers) and backtrace (<=12 steps) loop "
    "over PLANS with localCheckpoint truncation, never over rows.  "
    "The oracle unrolls the identical DP as ~50 chained CTEs",
    tags=("text", "tokenizer", "unigram", "iterative", "extension"),
)
def unigram_train_iterative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    _seed, usage1, _pieces2, emit2 = unigram_train_tables(docs)
    usage2 = piece_usage(emit2)
    return (
        usage2.join(
            usage1.withColumnRenamed("usage", "usage_prev"),
            "piece",
            "left",
        )
        .select(
            "piece",
            F.length("piece").cast("bigint").alias("piece_len"),
            "usage",
            F.coalesce(F.col("usage_prev"), F.lit(0))
            .cast("bigint")
            .alias("usage_prev"),
        )
        .orderBy(F.desc("usage"), F.asc("piece"))
        .limit(30)
    )


@register(
    "unigram_fertility_by_lang",
    f"""
    WITH {sql_unigram_ctes()},
    ug_wp AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_pieces
      FROM ug_emit2 GROUP BY word
    ),
    ug_corpus AS (
      SELECT lang, unnest({sql_tokens('text')}) AS word
      FROM documents
    )
    SELECT c.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w.n_pieces) AS BIGINT) AS n_pieces_total,
           (CAST(SUM(w.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             AS fertility
    FROM ug_corpus c
    JOIN ug_wp w ON w.word = c.word
    GROUP BY c.lang
    ORDER BY c.lang
    """,
    description="fertility (pieces per word) of the trained unigram "
    "tokenizer per language — the acceptance gauge of a tokenizer fit "
    "(the BPE family's bpe_fertility_by_lang, for the unigram "
    "trainer; a language whose fertility stays near its character "
    "count is under-served by the learned inventory).  Consumers read "
    "the round-2 segmentation from the once-per-process trained "
    "artifact (the rank-store amortization); word occurrences outside "
    "the trainable cap (length > 12) sit out, identically in both "
    "engines.  The corpus pass joins word -> n_pieces on the "
    "vocab-bounded segmentation table; the ratio is one exact int "
    "division",
    tags=("text", "tokenizer", "unigram", "evaluation", "extension"),
)
def unigram_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.hashing import tokens

    store = _ensure_segmentation(spark, sf_dir)
    wp = (
        spark.read.parquet(f"{store}/emit2")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pieces"))
    )
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("word")
    )
    n_words = F.count(F.lit(1)).cast("bigint")
    n_pieces = F.sum("n_pieces").cast("bigint")
    return (
        corpus.join(wp, "word")
        .groupBy("lang")
        .agg(
            n_words.alias("n_words"),
            n_pieces.alias("n_pieces_total"),
            (n_pieces.cast("double") / n_words.cast("double")).alias(
                "fertility"
            ),
        )
        .orderBy("lang")
    )
