"""Multi-vector (MaxSim) + Matryoshka invariants the SQL oracle can't
express: score bounds, candidate-set containment, and scoring-math
consistency between the exact and pruned paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _corpus_query(spark):
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    return corpus, query


def test_maxsim_bounds_and_self_score(spark):
    """MaxSim of k chunks of unit-bounded cosines lies in [-4, 4]; the
    query scored against itself achieves the maximum (each chunk's best
    match is itself, cosine exactly 1 by the quantized math)."""
    from eventstream_fanout_spark.operators.multivector import (
        NUM_CHUNKS,
        maxsim_score,
    )
    from eventstream_fanout_spark.sources.tables import load_table

    corpus, query = _corpus_query(spark)
    rows = maxsim_score(corpus, query).collect()
    assert rows
    for r in rows:
        assert -NUM_CHUNKS - 1e-9 <= r["maxsim"] <= NUM_CHUNKS + 1e-9
    # self-similarity: score the query doc against a corpus containing it
    emb = load_table(spark, SF_ORACLE, "embeddings")
    self_row = [
        r
        for r in maxsim_score(
            emb.where(F.col("vec_id") == 0), query
        ).collect()
    ]
    assert len(self_row) == 1
    assert abs(self_row[0]["maxsim"] - NUM_CHUNKS) < 1e-6


def test_maxsim_pruned_is_candidate_subset_with_exact_scores(spark):
    """Pruned top-k only contains stage-1 candidates, and every pruned
    score equals the exact MaxSim for that doc (same scoring math —
    pruning changes the candidate set, never the score)."""
    from eventstream_fanout_spark.operators.multivector import (
        chunk_candidates,
        maxsim_pruned_topk,
        maxsim_score,
    )

    corpus, query = _corpus_query(spark)
    cands = {
        r["vec_id"] for r in chunk_candidates(corpus, query).collect()
    }
    assert 0 < len(cands) < corpus.count(), "pruning must actually prune"
    exact = {
        r["vec_id"]: r["maxsim"]
        for r in maxsim_score(corpus, query).collect()
    }
    for r in maxsim_pruned_topk(corpus, query, 10).collect():
        assert r["vec_id"] in cands
        assert exact[r["vec_id"]] == r["maxsim"]


def test_matryoshka_rerank_scores_match_brute_force(spark):
    """Matryoshka's full-dim rerank cosine must equal the brute-force
    cosine for the same doc (identical quantized scoring), and results
    are descending in the full-dim score."""
    from eventstream_fanout_spark.operators.similarity import (
        brute_force_topk,
    )
    from eventstream_fanout_spark.plans.registry import QUERIES

    corpus, query = _corpus_query(spark)
    all_scores = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query, corpus.count()).collect()
    }
    rows = QUERIES["ann_matryoshka_topk"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert all_scores[r["vec_id"]] == r["cosine"]
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
