"""Semantics pins for the unigram tokenizer trainer
(operators/unigram.py): seed pruning, fewest-pieces-then-score
Viterbi, the back-pointer tie-break, usage re-estimation, and the
prune-with-reachability M-step — on hand-solvable corpora where the
expected segmentations can be verified by hand."""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _train(spark, texts):
    from eventstream_fanout_spark.operators.unigram import (
        piece_usage,
        unigram_train_tables,
    )

    seed, usage1, pieces2, emit2 = unigram_train_tables(
        _docs(spark, texts)
    )
    return (
        {(r["piece"]): r["score"] for r in seed.collect()},
        {(r["piece"]): r["usage"] for r in usage1.collect()},
        {(r["piece"]): r["score"] for r in pieces2.collect()},
        {(r["piece"]): r["usage"] for r in piece_usage(emit2).collect()},
    )


class TestUnigramTrainer:
    def test_prune_then_char_fallback(self, spark):
        # corpus = one word 'aaaa' (wc 1).  Seed: 'a'=4, 'aa'=3 (kept,
        # >= MIN_SEED_FREQ), 'aaa'=2 and 'aaaa'=1 pruned.  Round 1
        # Viterbi: [aa, aa] (2 pieces beats any 3+).  Usage 'aa'=2 <
        # MIN_USAGE=3, so round 2 keeps only chars -> [a, a, a, a].
        seed, usage1, pieces2, usage2 = _train(spark, ["aaaa"])
        assert seed == {"a": 4, "aa": 3}
        assert usage1 == {"aa": 2}
        assert pieces2 == {"a": 0}  # char survives with zero usage
        assert usage2 == {"a": 4}

    def test_surviving_piece_stays(self, spark):
        # 'abab' x2 (one doc, two tokens -> wc 2).  Seed multi-char
        # survivors: 'ab'=4, 'ba'=2 pruned, 'aba'/'bab'=2 pruned,
        # 'abab'=2 pruned.  Round 1: [ab, ab], usage 'ab'=4 >= 3 ->
        # survives re-estimation; round 2 identical.
        _seed, usage1, pieces2, usage2 = _train(spark, ["abab abab"])
        assert usage1 == {"ab": 4}
        assert pieces2 == {"a": 0, "b": 0, "ab": 4}
        assert usage2 == {"ab": 4}

    def test_backpointer_tiebreak_prefers_lowest_bp(self, spark):
        # 'abcde' x5: every substring has freq 5, so all <=4-char
        # pieces survive seeding.  Best segmentations all cost
        # 2*BIGC - 10 ([a,bcde], [ab,cde], [abc,de], [abcd,e]); the
        # argmin tie-break (lowest back-pointer at the final layer)
        # picks bp=1 -> [a, bcde].  A different tie-break would emit
        # different pieces and fail here.
        _seed, usage1, _pieces2, usage2 = _train(
            spark, ["abcde abcde abcde abcde abcde"]
        )
        assert usage1 == {"a": 5, "bcde": 5}
        assert usage2 == {"a": 5, "bcde": 5}

    def test_long_words_sit_out(self, spark):
        # 13-char word exceeds MAXW=12: contributes nothing anywhere.
        from eventstream_fanout_spark.operators.unigram import (
            unigram_words,
        )

        words = unigram_words(_docs(spark, ["abcdefghijklm ok"]))
        assert [(r["word"], r["wc"]) for r in words.collect()] == [
            ("ok", 1)
        ]

    def test_fertility_counts_pieces_per_occurrence(self, spark):
        # segmentation 'aaaa'->[a,a,a,a] (round 2, see first test):
        # fertility of a corpus that uses the word 3 times = 4.0
        from pyspark.sql import functions as F

        from eventstream_fanout_spark.operators.unigram import (
            piece_usage,  # noqa: F401 — import sanity
            unigram_train_tables,
            unigram_words,
        )

        docs = _docs(spark, ["aaaa"])
        _s, _u1, _p2, emit2 = unigram_train_tables(docs)
        wp = emit2.groupBy("word").agg(
            F.count(F.lit(1)).alias("n_pieces")
        )
        got = {r["word"]: r["n_pieces"] for r in wp.collect()}
        assert got == {"aaaa": 4}
