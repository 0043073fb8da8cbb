"""Unigram-LM (SentencePiece-style) tokenizer training via iterative
Viterbi segmentation over a distributed word vocabulary.

The BPE trainer (operators/tokenizer.py) grows a vocabulary bottom-up
by merging pairs; the unigram trainer (Kudo 2018, the SentencePiece
default) goes top-down: seed a large candidate-piece inventory, find
each word's BEST segmentation under the current piece scores
(Viterbi), re-estimate piece scores from how often the best
segmentations actually use them, prune pieces that earn no usage, and
repeat.  This module implements that loop with a fully DETERMINISTIC,
integer-exact objective so a DuckDB oracle can replay it CTE-for-CTE:

* Viterbi objective: fewest pieces first, then highest total piece
  score — encoded as one BIGINT cost ``n_pieces * BIGC - sum(score)``
  (BIGC = 10^15 exceeds any reachable score sum; a loud raise_error
  guard rides the seed scores).  Probability maximization becomes
  integer lexicographic minimization: no logs, no doubles, no
  cross-engine ulp risk — the same trade the k-means family makes.
* argmin tie-break: lowest back-pointer position wins (then the piece
  is determined).  Both engines pick the identical segmentation.
* re-estimation (the hard-EM M-step): new score = corpus-frequency-
  weighted usage in the round's best segmentations; multi-char pieces
  under MIN_USAGE drop, single chars always survive (reachability).

Scale shape (the same argument as the BPE trainer): after ONE
corpus-sized word count, every stage is VOCAB-sized — candidate
explosion is |vocab| x MAXW x MAXP rows, each DP step is a vocab-sized
join against the piece table, and the backtrace walks at most MAXW
steps.  Corpus row count never re-enters; at 100 TB the word count is
the only heavy stage.  The DP/backtrace loops iterate over PLANS
(MAXW fixed steps, localCheckpoint-truncated), never over rows.

Words are capped at MAXW characters (longer words sit out of training
— the SentencePiece max-piece/sentence-length posture) and pieces at
MAXP; both caps are identical in the oracle, so parity is exact.

Reference parity: the reference engine has no tokenizer surface
(pipeline/app.py:39-113); north-star extension alongside the BPE
trainer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import sql_tokens, tokens

MAXW = 12  # max word length that participates in training
MAXP = 4  # max piece length
MIN_SEED_FREQ = 3  # multi-char seed pieces need this corpus frequency
MIN_USAGE = 3  # multi-char pieces need this usage to survive a round
BIGC = 10**15  # piece-count weight in the integer Viterbi cost
N_ROUNDS = 2  # seed-scores round + one re-estimated round


def unigram_words(docs: DataFrame) -> DataFrame:
    """Corpus word-frequency table over the trainable cap:
    (word, wc) for 1 <= length <= MAXW."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(
            (F.length("word") >= 1) & (F.length("word") <= MAXW)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )


def seed_pieces(words: DataFrame) -> DataFrame:
    """Candidate inventory: every substring of every vocab word up to
    MAXP chars, scored by corpus-frequency-weighted occurrence count;
    single chars always kept (reachability), multi-char pieces need
    MIN_SEED_FREQ.  Vocab-sized x (MAXW x MAXP) — never corpus-sized."""
    u1 = words.select(
        "word",
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    )
    u2 = u1.select(
        "word",
        "wc",
        "i",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(MAXP), F.length("word") - F.col("i") + 1
                ),
            )
        ).alias("l"),
    )
    scored = (
        u2.select(
            F.col("word").substr(F.col("i"), F.col("l")).alias("piece"),
            "wc",
        )
        .groupBy("piece")
        .agg(F.sum("wc").cast("bigint").alias("score"))
    )
    guarded = scored.select(
        "piece",
        F.when(F.col("score") < F.lit(BIGC), F.col("score"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "seed_pieces: corpus frequency reached the integer "
                    f"Viterbi cost weight (score >= {BIGC}) — raise "
                    "BIGC before the lexicographic encoding breaks"
                )
            ).cast("bigint")
        )
        .alias("score"),
    )
    return guarded.where(
        (F.length("piece") == 1) | (F.col("score") >= MIN_SEED_FREQ)
    )


def _dp_layers(words: DataFrame, pieces: DataFrame) -> list[DataFrame]:
    """Viterbi forward pass: layers[j] holds each word's best
    (cost, back-pointer, piece) for prefix length j.  Each step is one
    vocab-sized join against the piece table; lineage is truncated per
    layer with localCheckpoint (the BPE-trainer discipline)."""
    layer0 = words.select(
        "word",
        "wc",
        F.lit(0).cast("bigint").alias("pos"),
        F.lit(0).cast("bigint").alias("cost"),
        F.lit(None).cast("bigint").alias("bp"),
        F.lit(None).cast("string").alias("piece"),
    ).localCheckpoint(eager=True)
    layers = [layer0]
    p = pieces.select(F.col("piece").alias("cpiece"), "score")
    for j in range(1, MAXW + 1):
        lo = max(0, j - MAXP)
        prev = reduce(DataFrame.unionByName, layers[lo:j])
        cand = (
            prev.where(F.length("word") >= j)
            .withColumn(
                "cpiece",
                F.col("word").substr(
                    (F.col("pos") + 1).cast("int"),
                    (F.lit(j) - F.col("pos")).cast("int"),
                ),
            )
            .join(p, "cpiece")
            .select(
                "word",
                "wc",
                (F.col("cost") + F.lit(BIGC) - F.col("score")).alias(
                    "cost"
                ),
                F.col("pos").alias("bp"),
            )
        )
        best = (
            cand.groupBy("word", "wc")
            .agg(F.min(F.struct("cost", "bp")).alias("m"))
            .select(
                "word",
                "wc",
                F.lit(j).cast("bigint").alias("pos"),
                F.col("m.cost").alias("cost"),
                F.col("m.bp").alias("bp"),
            )
            .withColumn(
                "piece",
                F.col("word").substr(
                    (F.col("bp") + 1).cast("int"),
                    (F.lit(j) - F.col("bp")).cast("int"),
                ),
            )
            .localCheckpoint(eager=True)
        )
        layers.append(best)
    return layers


def segment(words: DataFrame, pieces: DataFrame) -> DataFrame:
    """Best-segmentation emissions: one row (word, wc, piece) per
    piece of each word's Viterbi segmentation.  Backtrace walks the
    back-pointers from length(word) down to 0 — at most MAXW steps,
    each a vocab-sized join."""
    layers = _dp_layers(words, pieces)
    dpall = reduce(DataFrame.unionByName, layers[1:]).select(
        "word", "pos", "bp", "piece"
    )
    trace = words.select(
        "word", "wc", F.length("word").cast("bigint").alias("pos")
    ).localCheckpoint(eager=True)
    emitted = []
    for _ in range(MAXW):
        step = (
            trace.where(F.col("pos") > 0)
            .join(dpall, ["word", "pos"])
            .select("word", "wc", F.col("bp").alias("pos"), "piece")
            .localCheckpoint(eager=True)
        )
        emitted.append(step.select("word", "wc", "piece"))
        trace = step.select("word", "wc", "pos")
    return reduce(DataFrame.unionByName, emitted)


def piece_usage(emissions: DataFrame) -> DataFrame:
    """(piece, usage): corpus-frequency-weighted usage counts — the
    hard-EM re-estimated scores."""
    return emissions.groupBy("piece").agg(
        F.sum("wc").cast("bigint").alias("usage")
    )


def reestimated_pieces(
    seed: DataFrame, usage: DataFrame
) -> DataFrame:
    """The M-step inventory: single chars survive with their usage
    (0 if unused — reachability), multi-char pieces need MIN_USAGE."""
    chars = (
        seed.where(F.length("piece") == 1)
        .select("piece")
        .join(usage, "piece", "left")
        .select(
            "piece",
            F.coalesce(F.col("usage"), F.lit(0))
            .cast("bigint")
            .alias("score"),
        )
    )
    multi = usage.where(
        (F.length("piece") > 1) & (F.col("usage") >= MIN_USAGE)
    ).select("piece", F.col("usage").alias("score"))
    return chars.unionByName(multi)


def unigram_train_tables(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The full two-round trainer: returns (seed inventory, round-1
    usage, round-2 inventory, round-2 emissions)."""
    words = unigram_words(docs).localCheckpoint(eager=True)
    seed = seed_pieces(words).localCheckpoint(eager=True)
    usage1 = piece_usage(segment(words, seed)).localCheckpoint(
        eager=True
    )
    pieces2 = reestimated_pieces(seed, usage1).localCheckpoint(
        eager=True
    )
    emit2 = segment(words, pieces2)
    return seed, usage1, pieces2, emit2


# --- DuckDB oracle generation (CTE-for-CTE twin of the above) --------


def _sql_dp_blocks(r: int, piece_table: str) -> str:
    """DP layers dp{r}_0..dp{r}_MAXW + dpall{r} for round ``r``
    segmenting against ``piece_table`` (piece, score)."""
    blocks = [
        f"""
    ug_dp{r}_0 AS MATERIALIZED (
      SELECT word, wc, CAST(0 AS BIGINT) AS pos,
             CAST(0 AS BIGINT) AS cost,
             CAST(NULL AS BIGINT) AS bp, CAST(NULL AS VARCHAR) AS piece
      FROM ug_words
    )"""
    ]
    for j in range(1, MAXW + 1):
        lo = max(0, j - MAXP)
        prev = "\n      UNION ALL\n      ".join(
            f"SELECT * FROM ug_dp{r}_{i}" for i in range(lo, j)
        )
        blocks.append(f"""
    ug_dp{r}_{j} AS MATERIALIZED (
      SELECT word, wc, pos, cost, bp,
             substr(word, CAST(bp + 1 AS INTEGER),
                    CAST({j} - bp AS INTEGER)) AS piece
      FROM (
        SELECT d.word, d.wc, CAST({j} AS BIGINT) AS pos,
               d.cost + {BIGC} - p.score AS cost,
               d.pos AS bp,
               ROW_NUMBER() OVER (
                 PARTITION BY d.word
                 ORDER BY d.cost + {BIGC} - p.score ASC, d.pos ASC
               ) AS rn
        FROM ({prev}) d
        JOIN {piece_table} p
          ON p.piece = substr(d.word, CAST(d.pos + 1 AS INTEGER),
                              CAST({j} - d.pos AS INTEGER))
        WHERE length(d.word) >= {j}
      ) WHERE rn = 1
    )""")
    dpall = "\n      UNION ALL\n      ".join(
        f"SELECT word, pos, bp, piece FROM ug_dp{r}_{j}"
        for j in range(1, MAXW + 1)
    )
    blocks.append(f"""
    ug_dpall{r} AS MATERIALIZED (
      {dpall}
    )""")
    return ",".join(blocks)


def _sql_trace_blocks(r: int) -> str:
    """Backtrace trace{r}_1..trace{r}_MAXW + the usage{r} rollup."""
    blocks = [
        f"""
    ug_trace{r}_0 AS MATERIALIZED (
      SELECT word, wc, CAST(length(word) AS BIGINT) AS pos,
             CAST(NULL AS VARCHAR) AS piece
      FROM ug_words
    )"""
    ]
    for k in range(1, MAXW + 1):
        blocks.append(f"""
    ug_trace{r}_{k} AS MATERIALIZED (
      SELECT t.word, t.wc, d.bp AS pos, d.piece
      FROM ug_trace{r}_{k - 1} t
      JOIN ug_dpall{r} d ON d.word = t.word AND d.pos = t.pos
      WHERE t.pos > 0
    )""")
    emit = "\n      UNION ALL\n      ".join(
        f"SELECT word, wc, piece FROM ug_trace{r}_{k}"
        for k in range(1, MAXW + 1)
    )
    blocks.append(f"""
    ug_emit{r} AS MATERIALIZED (
      {emit}
    ),
    ug_usage{r} AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS usage
      FROM ug_emit{r} GROUP BY piece
    )""")
    return ",".join(blocks)


def sql_unigram_ctes() -> str:
    """The complete trainer chain: words -> seed -> round-1 DP/trace
    -> re-estimated inventory -> round-2 DP/trace.  Exposes
    ug_usage1, ug_pieces2, ug_emit2, ug_usage2."""
    return f"""
    ug_toks AS MATERIALIZED (
      SELECT unnest({sql_tokens('text')}) AS word FROM documents
    ),
    ug_words AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
      FROM ug_toks
      WHERE length(word) >= 1 AND length(word) <= {MAXW}
      GROUP BY word
    ),
    ug_sub1 AS MATERIALIZED (
      SELECT word, wc,
             CAST(unnest(generate_series(1, length(word))) AS BIGINT)
               AS i
      FROM ug_words
    ),
    ug_sub2 AS MATERIALIZED (
      SELECT word, wc, i,
             CAST(unnest(generate_series(
               1, least({MAXP}, length(word) - i + 1))) AS BIGINT) AS l
      FROM ug_sub1
    ),
    ug_seed AS MATERIALIZED (
      SELECT piece, score FROM (
        SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER))
                 AS piece,
               CAST(SUM(wc) AS BIGINT) AS score
        FROM ug_sub2 GROUP BY 1
      ) WHERE length(piece) = 1 OR score >= {MIN_SEED_FREQ}
    ),
    {_sql_dp_blocks(1, "ug_seed")},
    {_sql_trace_blocks(1)},
    ug_pieces2 AS MATERIALIZED (
      SELECT c.piece, CAST(COALESCE(u.usage, 0) AS BIGINT) AS score
      FROM (SELECT piece FROM ug_seed WHERE length(piece) = 1) c
      LEFT JOIN ug_usage1 u ON u.piece = c.piece
      UNION ALL
      SELECT piece, usage AS score FROM ug_usage1
      WHERE length(piece) > 1 AND usage >= {MIN_USAGE}
    ),
    {_sql_dp_blocks(2, "ug_pieces2")},
    {_sql_trace_blocks(2)}"""
