"""Quality/consistency checks the SQL oracle can't express: LSH ANN
results must be consistent with brute force (same scores, subset of
candidates), and the engine session must keep its scale-critical
configs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_lsh_ann_consistent_with_brute_force(spark):
    from eventstream_fanout_spark.plans.registry import QUERIES

    brute = {
        r["vec_id"]: r["cosine"]
        for r in QUERIES["ann_cosine_topk"].fn(spark, SF_ORACLE).collect()
    }
    # brute force over the full corpus (not just top-10) for score lookup
    from eventstream_fanout_spark.operators.similarity import (
        brute_force_topk,
    )
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    all_scores = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query, corpus.count()).collect()
    }
    lsh = QUERIES["ann_lsh_bucket_topk"].fn(spark, SF_ORACLE).collect()
    assert lsh, "LSH probe returned nothing"
    for r in lsh:
        # identical scoring math: the LSH cosine must equal brute force
        assert all_scores[r["vec_id"]] == r["cosine"]
    # ranks within the LSH result are consistent (descending cosine)
    cosines = [r["cosine"] for r in lsh]
    assert cosines == sorted(cosines, reverse=True)


def test_engine_session_configs(spark):
    """Scale-critical session conf must not silently regress."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= 8
    assert (
        "RocksDB"
        in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    )


def test_leakage_safe_splits_no_cross_split_neardups(spark):
    """The contamination guard: every LSH near-dup candidate pair must
    land entirely inside ONE split, and the split fractions must be in
    the neighborhood of the 12.5/12.5/75 gates."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    splits = QUERIES["leakage_safe_splits"].fn(spark, SF_ORACLE)
    by_doc = {r["doc_id"]: r["split"] for r in splits.collect()}

    from eventstream_fanout_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from eventstream_fanout_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).collect()
    assert pairs, "fixture should produce near-dup candidates"
    for p in pairs:
        assert by_doc[p["doc_a"]] == by_doc[p["doc_b"]], (
            p["doc_a"], p["doc_b"],
            by_doc[p["doc_a"]], by_doc[p["doc_b"]],
        )

    n = len(by_doc)
    frac = {s: sum(1 for v in by_doc.values() if v == s) / n
            for s in ("test", "val", "train")}
    assert 0.05 < frac["test"] < 0.25 and 0.05 < frac["val"] < 0.25
    assert frac["train"] > 0.5


def test_int8_quantization_error_bound(spark):
    """Affine int8 quantization with half-up rounding must keep every
    element within half a quantization step of its dequantized code."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    rows = QUERIES["embedding_int8_quantization"].fn(
        spark, SF_ORACLE
    ).collect()
    assert len(rows) > 100
    for r in rows:
        step = (r["hi"] - r["lo"]) / 255.0
        assert r["max_abs_err"] <= step / 2 + 1e-12, (
            r["vec_id"], r["max_abs_err"], step,
        )


def test_ivf_ann_consistent_with_brute_force(spark):
    """IVF-Flat probe results must carry brute-force-identical scores,
    come from at most nprobe inverted lists, and the index must assign
    every corpus vector to exactly one list."""
    from eventstream_fanout_spark.operators.similarity import (
        IVF_NPROBE,
        brute_force_topk,
        ivf_assign,
        ivf_centroids,
    )
    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    all_scores = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query, corpus.count()).collect()
    }
    ivf = QUERIES["ann_ivf_topk"].fn(spark, SF_ORACLE).collect()
    assert ivf, "IVF probe returned nothing"
    for r in ivf:
        assert all_scores[r["vec_id"]] == r["cosine"]
    assert len({r["list_id"] for r in ivf}) <= IVF_NPROBE
    cosines = [r["cosine"] for r in ivf]
    assert cosines == sorted(cosines, reverse=True)

    # the inverted index is a partition of the corpus
    assign = ivf_assign(corpus, ivf_centroids(corpus))
    assert assign.count() == corpus.count()
    assert assign.select("vec_id").distinct().count() == corpus.count()

    # candidate scoring stays list-local: no unbounded cartesian (the
    # only nested-loop joins are against constant-size broadcast sides)
    plan = (
        QUERIES["ann_ivf_topk"]
        .fn(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_multiprobe_superset_of_single_probe(spark):
    """Multi-probe LSH must (a) score candidates identically to brute
    force, (b) return a candidate set that contains every single-probe
    hit, and (c) achieve recall >= the single-probe path (the whole
    point of probing the Hamming-1 ring)."""
    from eventstream_fanout_spark.operators.similarity import (
        brute_force_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    truth = {r["vec_id"] for r in brute_force_topk(corpus, query, 10).collect()}
    all_scores = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query, corpus.count()).collect()
    }
    single = {r["vec_id"] for r in lsh_topk(corpus, query, 10).collect()}
    multi_rows = lsh_multiprobe_topk(corpus, query, 10).collect()
    multi = {r["vec_id"] for r in multi_rows}
    for r in multi_rows:
        assert all_scores[r["vec_id"]] == r["cosine"]
        assert r["probe_hamming"] in (0, 1)
    # top-10 from a superset of candidates can only displace single-
    # probe hits with HIGHER-scored ones — recall never decreases
    assert len(multi & truth) >= len(single & truth)
    assert any(r["probe_hamming"] == 1 for r in multi_rows) or single == multi


def test_fitted_ivf_centroids_improve_or_match_recall(spark):
    """The sampled-k-means quantizer (ivf_fit_centroids) must keep the
    (cid, ce) contract — 8 lists, same plans — and its recall@10 on the
    fixture must be at least the seed-centroid recall (VERDICT r3
    item 5: fitted centroids replace the documented stand-in)."""
    from eventstream_fanout_spark.operators.similarity import (
        brute_force_topk,
        ivf_fit_centroids,
        ivf_topk,
    )
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    fitted = ivf_fit_centroids(corpus, n_iters=2)
    rows = fitted.collect()
    assert len(rows) == 8
    assert all(len(r["ce"]) == 64 for r in rows)

    truth = {r["vec_id"] for r in brute_force_topk(corpus, query, 10).collect()}
    seed_hits = {
        r["vec_id"] for r in ivf_topk(corpus, query, 10).collect()
    } & truth
    fit_hits = {
        r["vec_id"]
        for r in ivf_topk(corpus, query, 10, centroids=fitted).collect()
    } & truth
    assert len(fit_hits) >= len(seed_hits), (
        f"fitted recall {len(fit_hits)}/10 < seed recall {len(seed_hits)}/10"
    )


def test_ivf_topk_refuses_broken_centroid_set(spark):
    """A corpus lacking the seed vec_ids must raise loudly (at
    execution — the guard is a lazy in-plan check, not an extra job)
    instead of silently returning zero rows (ADVICE r3)."""
    import pytest

    from eventstream_fanout_spark.operators.similarity import ivf_topk
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") > 100)  # no seed ids 10..17
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    broken = ivf_topk(corpus, query, 10)  # constructs fine (lazy)
    with pytest.raises(Exception, match="centroid set"):
        broken.collect()


def test_random_projection_jl_guarantee(spark):
    """JL: the reduced/original squared-norm ratio has expectation 1;
    its corpus mean must sit tight around 1 and the recall report must
    show both ANN paths retrieving a nontrivial share of the true
    top-10."""
    from eventstream_fanout_spark.plans.registry import QUERIES

    rows = (
        QUERIES["embedding_random_projection"]
        .fn(spark, SF_ORACLE)
        .select("norm_ratio")
        .collect()
    )
    ratios = [r["norm_ratio"] for r in rows]
    mean = sum(ratios) / len(ratios)
    assert 0.85 <= mean <= 1.15, mean
    assert all(r > 0 for r in ratios)

    recall = {
        r["method"]: r["recall_at_10"]
        for r in QUERIES["ann_recall_report"].fn(spark, SF_ORACLE).collect()
    }
    assert set(recall) == {"lsh", "ivf"}
    for method, r in recall.items():
        assert 0.0 <= r <= 1.0
    assert max(recall.values()) > 0, "both ANN paths missed everything"


def test_pq_adc_quality_and_structure(spark):
    """PQ/ADC (round 5): the recall report must show the 8-byte codes
    retrieving a nontrivial share of the exact quantized-L2 top-10,
    ADC distances must be non-negative BIGINTs, and the top-k must be
    ascending in distance (nearest first)."""
    from eventstream_fanout_spark.plans.registry import QUERIES

    rep = {
        r["method"]: r["n_hits"]
        for r in QUERIES["ann_pq_recall_report"].fn(spark, SF_ORACLE).collect()
    }
    assert set(rep) == {"pq_adc", "pq_adc_rerank100"}
    # pure 8-byte-code ADC is coarse on near-random synthetic vectors
    # but must beat chance; the shortlist+exact-rerank stage is the
    # production recall path and must recover a majority of the truth
    assert rep["pq_adc"] >= 1, rep
    assert rep["pq_adc_rerank100"] >= 5, rep
    assert rep["pq_adc_rerank100"] >= rep["pq_adc"], rep

    rows = QUERIES["ann_pq_adc_topk"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    dists = [r["adc_dist"] for r in rows]
    assert all(isinstance(d, int) and d >= 0 for d in dists)
    assert dists == sorted(dists)


def test_pq_adc_refuses_missing_codebook(spark, tmp_path):
    """A corpus lacking (some of) the seed vec_ids 10..17 must raise at
    execution instead of ADC-scanning against an empty codebook and
    returning a silently empty top-k (VERDICT r5 item 3) — same lazy
    assert_true-count guard as ivf_topk, no extra Spark job."""
    import pytest

    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    emb.where((F.col("vec_id") < 10) | (F.col("vec_id") > 17)).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    broken = QUERIES["ann_pq_adc_topk"].fn(
        spark, str(tmp_path)
    )  # constructs fine (lazy)
    with pytest.raises(Exception, match="codebook"):
        broken.collect()


def test_semantic_diversity_sample_caps_every_cluster(spark):
    """Every IVF cluster contributes at most 25 vectors and all 8
    clusters are present (the seed centroids partition the corpus)."""
    from eventstream_fanout_spark.plans.registry import QUERIES

    rows = (
        QUERIES["semantic_cluster_diversity_sample"]
        .fn(spark, SF_ORACLE)
        .collect()
    )
    per = {}
    for r in rows:
        per.setdefault(r["list_id"], set()).add(r["vec_id"])
    assert set(per) == set(range(10, 18))
    assert all(len(v) <= 25 for v in per.values())


def test_lloyd_fit_is_lazy_at_plan_construction(spark):
    """VERDICT r6 item 8: constructing a plan over ivf_fit_centroids
    must run NO fit jobs (the fit persist()s lazily; the old eager
    localCheckpoint executed n_iters corpus scans during construction,
    so plan-only tooling like dump_plans paid the full fit).  Only
    parquet metadata reads are allowed in the construction window."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    sc = spark.sparkContext
    group = "lazy-fit-construction"
    sc.setJobGroup(group, "plan construction only")
    try:
        df = QUERIES["ann_ivf_fitted_topk"].fn(spark, SF_ORACLE)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    store = spark._jsc.sc().statusStore()
    listed = store.jobsList(None)
    names = {
        listed.apply(i).jobId(): listed.apply(i).name()
        for i in range(listed.size())
    }
    for j in jobs:
        assert "parquet" in names.get(j, "parquet"), (
            f"construction ran a non-metadata job: {names.get(j)}"
        )
    # and execution still returns the fitted top-10
    assert len(df.collect()) == 10


def test_vector_dedup_multiprobe_widens_rejections(spark):
    """The nprobe recall dial must be monotone: every cell-local
    rejection survives at nprobe=2, and every nprobe=2 rejection at
    nprobe=8 (all cells — the pure-ADC gate, no cell miss possible)."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.ann_index import (
        encode_pq_codes,
        pq_codebook,
    )
    from eventstream_fanout_spark.operators.similarity import ivf_centroids
    from eventstream_fanout_spark.plans.similarity_queries import (
        VEC_DEDUP_THRESH,
    )
    from eventstream_fanout_spark.sources.tables import load_table
    from eventstream_fanout_spark.streaming.vector_dedup import (
        dedup_vector_batch,
    )
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    evens = emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") != 0))
    odds = emb.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    codebook = pq_codebook(emb)
    centroids = ivf_centroids(emb)
    store = encode_pq_codes(
        evens.select("vec_id", "embedding"), codebook, centroids
    )

    def rejected(nprobe):
        survivors, _ = dedup_vector_batch(
            odds, store, codebook, centroids, VEC_DEDUP_THRESH, nprobe=nprobe
        )
        alive = {r["vec_id"] for r in survivors.select("vec_id").collect()}
        return {
            r["vec_id"] for r in odds.select("vec_id").collect()
        } - alive

    r1, r2, r8 = rejected(1), rejected(2), rejected(8)
    assert r1 <= r2 <= r8
    assert r1, "fixture produced no rejections at all"


def test_pq_fitted_codebook_reduces_quantization_error(spark):
    """One per-subspace Lloyd round must not worsen total quantization
    distortion (sum over (vector, subspace) of the min squared
    distance to the codebook) — the k-means descent property, on the
    same exact-BIGINT distances the index stores."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.ann_index import (
        l2q,
        pq_codebook,
        pq_fit_codebook,
        pq_subspaces,
    )
    from eventstream_fanout_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    sub = pq_subspaces(corpus)

    def distortion(cb):
        return (
            sub.join(F.broadcast(cb), "s")
            .select(
                "vec_id", "s", l2q(F.col("sub"), F.col("ce")).alias("d")
            )
            .groupBy("vec_id", "s")
            .agg(F.min("d").alias("md"))
            .agg(F.sum("md").alias("t"))
            .collect()[0]["t"]
        )

    seed = distortion(pq_codebook(corpus))
    fitted = distortion(pq_fit_codebook(corpus, n_iters=1))
    assert fitted <= seed, (fitted, seed)
    assert fitted < seed, "fit changed nothing — suspicious fixture"
