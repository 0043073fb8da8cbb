"""Iterative BPE tokenizer TRAINING over a distributed word vocabulary.

The existing tokenizer family fits ONE round of pair statistics
(``bpe_merge_candidates``) and applies a static merge table
(``bpe_apply_tokenize``).  This module adds the real trainer loop: N
rounds where each round (1) counts corpus-frequency-weighted adjacent
SYMBOL pairs over the current segmentation, (2) picks the argmax pair
(freq desc, then pair lexicographic — fully deterministic), and
(3) applies the merge with exact leftmost-greedy semantics, so merged
symbols from round t participate in round t+1's counts — the part a
single-round fit cannot express.

Scale shape (the reason BPE trainers run on aggregated vocabularies):
after one corpus-sized word count, every round works on the VOCAB
(|distinct words| x avg word length symbol rows), independent of corpus
row count — at 100 TB the corpus pass is the only heavy stage and the
loop is a constant-size tail.  Each round is two vocab-partitioned
window passes + one vocab-sized join; lineage is truncated per round
with ``localCheckpoint`` (same pattern as operators/graph.py
``pagerank_integer``) so the plan stays constant-size across rounds.

Leftmost-greedy merge application (the subword-nmt / HF-tokenizers
semantics) is expressed relationally via gaps-and-islands: candidate
positions that chain (each ending exactly where the next starts — only
possible for self-merges like ``(a, a)`` over a run) form an island,
and the greedy scan takes the 1st, 3rd, 5th ... candidate of each
island.  No UDFs, no driver-side loops over data — the round count is
the only Python loop, and it loops over PLANS, not rows.

Reference parity: the reference engine has no tokenizer surface
(pipeline/app.py:39-113 is enrich/aggregate only); this is part of the
training-data-pipeline extension surface (SURVEY.md north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Merge rounds for the registered query — enough that multi-char
# symbols formed early (e.g. "th") visibly win later rounds.
N_MERGES = 8


def word_counts(docs: DataFrame) -> DataFrame:
    """Corpus word-frequency table: (word, wc) for words of length >=2
    (single-char words have no pairs and cannot influence any merge)."""
    from ..functions.hashing import tokens

    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )


def _initial_symbols(wc: DataFrame) -> DataFrame:
    """Explode each vocab word to (word, wc, pos, sym) character rows,
    pos 1-based (character-based substr — identical on both engines)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return wc.select(
        "word", "wc", F.posexplode(chars).alias("p0", "sym")
    ).select(
        "word",
        "wc",
        (F.col("p0") + 1).cast("bigint").alias("pos"),
        "sym",
    )



def _greedy_merge_step(pairs, cand):
    """Shared leftmost-greedy application: given the paired
    segmentation (word, wc, pos, sym, nsym, npos) and the candidate
    rows (word, pos, npos) for ONE merge, return the new segmentation.
    Islands of chained candidates (each ending exactly where the next
    starts — only self-merges chain) take their 1st/3rd/5th... rank;
    merged rows keep the LEFT position and absorb the right row.
    Used by BOTH the trainer loop and the stored-merge apply path so
    training and serving segmentation cannot diverge."""
    w_word = Window.partitionBy("word").orderBy("pos")
    w_run = w_word.rowsBetween(Window.unboundedPreceding, 0)
    take = (
        cand.withColumn(
            "new_isl",
            F.when(
                F.lag("npos").over(w_word) == F.col("pos"), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("isl", F.sum("new_isl").over(w_run))
        .withColumn(
            "k",
            F.row_number().over(
                Window.partitionBy("word", "isl").orderBy("pos")
            ),
        )
        .where(F.col("k") % 2 == 1)
        .select(
            F.col("word").alias("t_word"),
            F.col("pos").alias("t_pos"),
            F.col("npos").alias("t_npos"),
        )
    )
    absorbed = take.select(
        F.col("t_word").alias("word"), F.col("t_npos").alias("pos")
    )
    return (
        pairs.join(
            take,
            (pairs["word"] == take["t_word"])
            & (pairs["pos"] == take["t_pos"]),
            "left",
        )
        .select(
            "word",
            "wc",
            "pos",
            F.when(
                F.col("t_pos").isNotNull(),
                F.concat(F.col("sym"), F.col("nsym")),
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .join(absorbed, ["word", "pos"], "left_anti")
    )


def _paired(syms):
    """Segmentation with each row's next symbol/position attached."""
    w_word = Window.partitionBy("word").orderBy("pos")
    return syms.select(
        "word",
        "wc",
        "pos",
        "sym",
        F.lead("sym").over(w_word).alias("nsym"),
        F.lead("pos").over(w_word).alias("npos"),
    )


def bpe_train(wc: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (merge_rank int, left_sym, right_sym, pair_freq bigint).

    Greedy application invariant per round: within each island of
    chained candidates the 1st/3rd/... are merged (leftmost-greedy);
    merged rows keep the LEFT symbol's position and absorb the right
    row, so positions stay strictly increasing (sparse) across rounds.
    """
    syms = _initial_symbols(wc).localCheckpoint(eager=True)

    merge_rows: list[DataFrame] = []
    for t in range(1, n_merges + 1):
        pairs = _paired(syms)
        best = (
            pairs.where(F.col("nsym").isNotNull())
            .groupBy("sym", "nsym")
            .agg(F.sum("wc").cast("bigint").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("sym"), F.asc("nsym"))
            .limit(1)
            .select(
                F.col("sym").alias("l"),
                F.col("nsym").alias("r"),
                "pair_freq",
            )
            .localCheckpoint(eager=True)  # 1 row; stops plan nesting
        )
        merge_rows.append(
            best.select(
                F.lit(t).cast("int").alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                "pair_freq",
            )
        )
        # Leftmost-greedy take-set: islands of chained candidates
        # (previous candidate's npos == this pos), odd ranks win.
        cand = pairs.join(
            F.broadcast(best),
            (pairs["sym"] == best["l"]) & (pairs["nsym"] == best["r"]),
        ).select("word", "pos", "npos")
        syms = _greedy_merge_step(pairs, cand).localCheckpoint(
            eager=True
        )

    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def _apply_one_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Apply ONE (left, right) merge to a (word, wc, pos, sym)
    segmentation — the serve-path entry to the SAME greedy step the
    trainer uses (only the candidate filter differs: literal symbols
    instead of the fitted argmax row)."""
    pairs = _paired(syms)
    cand = pairs.where(
        (F.col("sym") == F.lit(left)) & (F.col("nsym") == F.lit(right))
    ).select("word", "pos", "npos")
    return _greedy_merge_step(pairs, cand)


def apply_merges(
    wc: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize the vocabulary with an ALREADY-TRAINED ordered merge
    list (the serve path of a persisted tokenizer artifact): character
    segmentation, then each merge applied in rank order with greedy
    semantics identical to training.  The merge list is model-sized
    (driver-held, like a broadcast codebook); the data stays
    distributed — each merge application is vocab-sized window work,
    localCheckpoint-truncated per step.  Returns the final
    (word, wc, pos, sym) segmentation."""
    syms = _initial_symbols(wc).localCheckpoint(eager=True)
    for left, right in merges:
        syms = _apply_one_merge(syms, left, right).localCheckpoint(
            eager=True
        )
    return syms
