"""Hot-bucket salting in the LSH/SimHash candidate joins
(operators/dedup.py:_salted_bucket_pairs) — the skew fix VERDICT r3
item 3 asked for.

The salted join must be LOSSLESS (identical pair set to the unsalted
equi-join, every pair exactly once) and must actually ENGAGE on a
bucket above the cap (left rows spread over all salts, right rows
replicated n_salts times inside the hot bucket, zero replication
outside it).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_fanout_spark.operators.dedup import (
    HOT_BUCKET_CAP,
    _salted_bucket_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_docs,
    simhash_near_pairs,
)
from eventstream_fanout_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _banded_fixture(spark, hot_n=40, cold_n=6):
    """One degenerate bucket with ``hot_n`` members (the short-doc
    pathology) plus ``cold_n`` singleton buckets."""
    rows = [(i, 0, 777) for i in range(hot_n)]
    rows += [(1000 + i, 0, 1000 + i) for i in range(cold_n)]
    return spark.createDataFrame(rows, "doc_id long, band int, bh long")


def _pair_set(df):
    return {
        (r["doc_a"], r["doc_b"])
        for r in df.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        ).collect()
    }


def test_salted_join_lossless_and_exactly_once(spark):
    banded = _banded_fixture(spark)
    salted = _salted_bucket_pairs(
        banded, ["band", "bh"], "doc_id", hot_cap=10, n_salts=4
    )
    unsalted = _salted_bucket_pairs(
        banded, ["band", "bh"], "doc_id", hot_cap=10**9
    )
    hot_expected = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert _pair_set(unsalted) == hot_expected
    assert _pair_set(salted) == hot_expected
    # exactly once — no pair may surface through two salt values
    assert salted.count() == len(hot_expected)


def test_salting_engages_only_on_hot_buckets(spark):
    banded = _banded_fixture(spark)
    salted = _salted_bucket_pairs(
        banded, ["band", "bh"], "doc_id", hot_cap=10, n_salts=4
    )
    left = salted.select(
        F.col("a.doc_id").alias("doc_id"), F.col("a._salt").alias("salt")
    ).distinct()
    hot_salts = {
        r["salt"] for r in left.where(F.col("doc_id") < 1000).collect()
    }
    # xxhash64 spreads 40 ids over 4 salts; all salts must be in use
    assert hot_salts == {0, 1, 2, 3}
    # cold buckets never salt (and have no pairs — singletons)
    cold = salted.where(F.col("a.doc_id") >= 1000)
    assert cold.count() == 0


def test_salted_join_stays_equi_join(spark):
    """No BroadcastNestedLoopJoin / CartesianProduct may appear: the
    salt must ride the equi-join keys, not a theta join."""
    banded = _banded_fixture(spark)
    plan = (
        _salted_bucket_pairs(banded, ["band", "bh"], "doc_id", hot_cap=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fixture_pairs_unchanged_by_default_caps(spark):
    """On the real fixture (no bucket near HOT_BUCKET_CAP) the salted
    operators must reproduce the oracle-pinned pair counts."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    assert HOT_BUCKET_CAP == 1_000
    lsh = lsh_candidate_pairs(minhash_signatures(docs))
    assert lsh.count() == 25  # CORRECTNESS_r03 minhash_lsh_pairs
    sim = simhash_near_pairs(simhash_docs(docs), max_hamming=3)
    assert sim.count() == 3790  # CORRECTNESS_r03 simhash_near_pairs


def test_streaming_within_batch_rejection_matches_unsalted(spark):
    """The streaming within-batch rejection (corpus_dedup vs_batch,
    salted in round 5 to match its docstring) must reject exactly the
    set a plain (band, bh, id<id) join would: every non-minimum id of
    each band group, even when the bucket is hot enough to salt."""
    banded = _banded_fixture(spark)
    salted_rejected = {
        r["doc_id"]
        for r in _salted_bucket_pairs(
            banded, ["band", "bh"], "doc_id", hot_cap=10, n_salts=4
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .collect()
    }
    a, b = banded.alias("a"), banded.alias("b")
    plain_rejected = {
        r["doc_id"]
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
        .collect()
    }
    assert salted_rejected == plain_rejected == set(range(1, 40))


def test_exact_substring_injected_duplicates_fully_covered(spark):
    """Property: the dedup fixture's template corpus guarantees the
    exact-substring report finds REAL duplicated spans, and any doc
    whose full token stream appears in another doc (if present) shows
    dup_ratio 1.0; the cut step then empties exactly the fully-covered
    docs and the kept counts reconcile: n_tokens - dup_tokens ==
    n_tokens_kept for every doc."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    spans = QUERIES["exact_substring_spans"].fn(spark, SF_ORACLE)
    cut = QUERIES["exact_substring_dedup_cut"].fn(spark, SF_ORACLE)
    j = spans.join(
        cut.select("doc_id", "n_tokens_kept"), "doc_id"
    ).collect()
    assert any(r["n_dup_spans"] > 0 for r in j), "fixture has no dups"
    for r in j:
        assert r["n_tokens"] - r["dup_tokens"] == r["n_tokens_kept"], r
        assert 0 <= r["dup_ratio"] <= 1.0
        if r["dup_ratio"] == 1.0:
            assert r["n_tokens_kept"] == 0


def test_simhash_pairs_posture_is_measured(spark):
    """r13 verdict item 8: simhash_near_pairs routes through
    adaptive_bucket_pairs — a clean corpus plans the plain equi-join
    (no salt explode), a replica-heavy corpus flips to the salt split,
    and both postures return the identical pair set."""
    from eventstream_fanout_spark.operators.dedup import (
        simhash_near_pairs_measured,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon zeta token{i} end")
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    sim = simhash_docs(docs)
    pairs_plain, salted, max_cnt = simhash_near_pairs_measured(
        sim, 3, hot_cap=50
    )
    assert not salted and max_cnt <= 50
    plan = pairs_plain._jdf.queryExecution().executedPlan().toString()
    assert "explode(sequence" not in plan.lower()

    # replicate one doc's text so every bit-band bucket goes hot
    hot_docs = docs.unionByName(
        spark.createDataFrame(
            [(100 + i, "alpha beta gamma delta epsilon zeta token0 end")
             for i in range(8)],
            "doc_id long, text string",
        )
    )
    sim_h = simhash_docs(hot_docs)
    pairs_hot, salted_h, max_h = simhash_near_pairs_measured(
        sim_h, 3, hot_cap=5
    )
    assert salted_h and max_h > 5
    plan_h = pairs_hot._jdf.queryExecution().executedPlan().toString()
    assert "explode" in plan_h.lower()

    # posture-independence of the result set on the same corpus
    plain_set = {
        tuple(r)
        for r in simhash_near_pairs_measured(sim_h, 3, hot_cap=10**9)[0]
        .collect()
    }
    hot_set = {tuple(r) for r in pairs_hot.collect()}
    assert plain_set == hot_set and len(hot_set) > 0
