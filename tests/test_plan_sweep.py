"""Repo-wide plan-hygiene sweep over the ENTIRE registered batch
surface — the standing version of the per-query plan tests: no
unbounded cartesian anywhere, nested-loop joins only against
constant-size broadcast sides that are explicitly allowlisted, and no
row-at-a-time Python UDFs (Arrow-batched pandas UDFs only where
declared).  A new query that regresses scale hygiene fails here
without anyone having to remember to add a test."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE

# Queries whose plan legitimately contains BroadcastNestedLoopJoin:
# every one is a crossJoin against a CONSTANT-size broadcast side
# (1-row query vector, 5-row anchor batch, 8-row centroid set) — per-row
# work bounded by a constant, so the "nested loop" is really a map.
BNLJ_ALLOWED = {
    "ann_cosine_topk",
    "ann_batch_topk",
    "ann_binary_hamming_topk",  # 1-row broadcast packed-words query
    "ann_binary_rerank_topk",  # same + 1-row query-vector rerank side
    "ann_lsh_bucket_topk",
    "ann_ivf_topk",
    "ann_ivf_fitted_topk",  # same 8-row centroid set, fitted by Lloyd
    "ann_ivfpq_persisted_topk",  # 1-row query x stored 8-row centroids
    "ann_pq_filtered_topk",  # same 1-row query x 8-row centroid ranking
    "ann_attr_evolve_sim",  # same filtered-probe centroid ranking
    "ann_list_merge_sim",  # 1-row query x manifest semi-join probe
    "ann_attr_drop_sim",  # same filtered-probe centroid ranking
    "text_attr_drop_sim",  # 1-row corpus-stats broadcast side
    "ann_filtered_soak_sim",  # same (streaming-tagged; listed for parity)
    "ann_pq_persisted_fitted_topk",  # 1-row query x fitted 8-row centroids
    "ann_pq_fully_fitted_topk",  # 1-row query x fitted 8-row centroids
    "ann_pq_persisted_batch_topk",  # query batch x 8-row centroid ranking
    "bm25_batch_search",  # 1-row corpus-stats side (n_docs, total_len)
    "hybrid_batch_search_rrf",  # 1-row stats + 8-row centroid sides
    "ann_recall_report",  # composes the three ANN top-k plans above
    "maxsim_multivector_topk",  # 4-row broadcast query-chunk side
    "maxsim_pruned_topk",  # same 4-row chunk side (+ 4-row bucket probe)
    "maxsim_recall_report",  # composes the two MaxSim plans above
    "maxsim_persisted_topk",  # 4-row chunk side over the stored scan
    "mv_index_ingest_sim",  # same stored-probe 4-row chunk side
    "mv_index_delete_sim",  # same stored-probe 4-row chunk side
    "mv_index_compact_sim",  # same stored-probe 4-row chunk side
    "ann_matryoshka_topk",  # 1-row broadcast query (prefix + full norms)
    "ann_matryoshka_recall_report",  # same + brute-force truth side
    "ann_pq_recall_report",  # exact-L2 twin: broadcast 1-row query
    "ann_pq_rerank_topk",  # broadcast 1-row query on the rerank side
    "hard_negative_mining",
    "embedding_near_pairs",  # sample-capped ground-truth verifier
    "vector_dedup_recall_report",  # sample-capped exact-L2 truth side
    "corpus_clean_pipeline",  # chains the ANN scoring above
    "benchmark_decontamination",  # broadcast bench-probe set
    # scalar-subquery joins: the build side is a 1-row aggregate
    # (TPC-H threshold / total-doc-count), a constant by construction
    "weighted_systematic_sample",  # 1-row corpus-token-total side
    "epoch_repeat_schedule",  # 1-row corpus-total + quantized-sqrt side
    "bigram_lift_top",  # 1-row corpus-token-total side
    "semantic_cluster_diversity_sample",  # 8-row broadcast centroid set
    "dq_expectations_report",  # 1-row orphan-count side
    "bm25_keyword_search",  # 1-row corpus-stats side (n_docs, total_len)
    "bm25_hot_term_bound",  # same 1-row stats side (bounded merged probe)
    "text_index_delete_sim",  # 1-row corpus-stats side (post-erasure probe)
    "text_index_compact_sim",  # same 1-row stats side (post-compact probe)
    "text_index_upsert_sim",  # same 1-row stats side (post-upsert probe)
    "text_index_asof_probe",  # same 1-row stats side (watermark-filtered)
    "hybrid_search_rrf",  # 1-row query vector + 1-row stats sides
    "rag_context_pack",  # composes the hybrid fused relation above
    "bloom_decontamination_prefilter",  # 1-row broadcast bitmap side
    "dsir_importance_select",  # 1-row corpus-total side (t_tot, s_tot)
    "lm_incremental_update_sim",  # 1-row store-vs-refit verdict side
    "lm_erasure_sim",  # same 1-row verdict side (post-erasure)
    "stream_lm_ingest",  # 1-row vocab-total side on the served probe
    "temperature_mix_sample",  # 1-row sqrt-sum normalizer side
    "curation_v3_pipeline",  # same 1-row sqrt-sum normalizer side
    "q11_important_balance",
    "q22_global_sales_opportunity",
    "tfidf_top_terms",
    "vocab_coverage",
    # sketch sandwich queries (round 4): crossJoins of 1-row aggregates
    # (exact count / distinct / estimate rows) and <=25-row quantile
    # spec sides — every build side constant by construction
    "approx_quantiles_value",
    "kll_daily_merge_quantiles",
    "theta_sketch_user_sets",
    "hll_daily_merge_distinct",
    # round 11: the same 1-row-query x 8-row-centroid coarse rankings
    "ann_filtered_live_sim",  # filtered probe over the live store
    "ann_recall_after_churn",  # two pruned probes + the full-ADC truth
    "ann_index_refit_sim",  # post-refit pruned probe
    "hybrid_filtered_search_rrf",  # 1-row stats + centroid sides
    "bm25_filtered_search",  # 1-row corpus-stats side
    "text_attr_evolve_sim",  # same 1-row corpus-stats broadcast side
    "streaming_upsert_sim",  # 1-row stats side (post-upsert probe)
    "ann_pq_filtered_batch_topk",  # query batch x 8-row centroid ranking
    "bm25_filtered_batch_search",  # 1-row corpus-stats side
    "ann_filtered_asof_sim",  # 1-row query x 8-row centroid ranking
    "text_filtered_asof_probe",  # 1-row corpus-stats side
    # round 12 late additions: constant-size model/stats sides
    "lang_classifier_report",  # 1-row vocab + n-classes prior sides
    "lang_classifier_confusion",  # same fitted-model sides
    "domain_pagerank",  # 1-row node-count side per rank iteration
    "key_skew_report",  # 1-row global-stats side
    "knn_classifier_report",  # <=100-row capped eval batch (EVAL_CAP)
    "lang_classifier_prf",  # same fitted-model sides as the reports
    "authority_weighted_sample",  # pagerank 1-row sides + 1-row total
    "embedding_covariance_top",  # 1-row n_vecs broadcast side
    "knn_classifier_ivf_report",  # the batch probe's qtable/centroid sides
    "curation_v2_pipeline",  # pagerank + fitted-model constant sides
    # round 12 continuation: k-row centroid broadcast per Lloyd round
    "kmeans_lloyd_report",  # 8-row centroid set x corpus, per round
    "kmeans_label_purity",  # same Lloyd chain + label join
    "kmeans_minibatch_sim",  # served-centroid broadcasts per trigger
    "kmeans_erasure_sim",  # same (streaming-tagged; listed for parity)
    "pca_power_loadings",  # 1-row max-abs rescale side per power step
    "pca_stratified_sample",  # same power chain + 64-row loading side
    "bpe_store_token_stats",  # 1-row vocab-size broadcast side
    "kmeans_outlier_report",  # 8-row centroid broadcasts, Lloyd chain
    "cluster_quota_curation",  # same Lloyd chain + 1-row total side
    "kmeans_seed_quality_report",  # <=k-row seed broadcasts per pass
    "kmeans_refit_sim",  # frozen/refreshed centroid broadcasts
    # round 13: drift monitor's 1-row stage-accuracy + decision sides
    "classifier_drift_report",
    # round 13: pagerank 1-row node-count sides + 1-row edge counts
    "pagerank_staleness_report",
    # round 14: 1-row live-partition-count broadcast side
    "graph_postings_compact_sim",
    # round 14: 1-row vocab-total + 1-row live-partition-count sides
    "lm_compaction_sim",
    "stream_lm_autocompact",
    "lm_kn_store_scoring_sim",
}

# Queries whose plan legitimately contains an UNPARTITIONED Window
# (WindowExec with no PARTITION BY moves its whole input to ONE task —
# the corpus-wide variants were round-12's two scale-killers, both
# fixed in round 13).  Every entry here windows a BOUNDED relation:
# a bucket-level cumulative (two-level decomposition, input = bucket
# count), a post-aggregation top-k (input <= the two-level 51,200-row
# cap), or a request-sized candidate set.  A new query that windows
# an unbounded relation fails the sweep instead of shipping a
# single-partition sort.
GLOBAL_WINDOW_ALLOWED = {
    "session_concurrency_sweep",  # cumulative over HOURLY buckets
    "kll_daily_merge_quantiles",  # cumulative over the value histogram
    "bpe_merge_candidates",  # row_number over aggregated pair freqs
    "vocab_coverage",  # second level of the two-level rank (<=51,200)
    "corpus_shuffle_order",  # cumulative over shuffle buckets
    "weighted_systematic_sample",  # cumulative over token-sum buckets
    "training_export_pipeline",  # same bucket cumulative, composed
    "hybrid_search_rrf",  # row_number over fused top-k candidates
    "hybrid_filtered_search_rrf",  # same, filtered probe
    "rag_context_pack",  # cumulative over the fused candidate set
}


def _global_windows(plan: str) -> list[str]:
    """Window nodes with no partition spec.  Node format:
    ``Window [exprs], [partition], [order]`` — 3 bracket groups when
    partitioned; 2 groups whose second holds sort specs (ASC/DESC)
    when global-ordered; 1 group when global-unordered."""
    out = []
    for line in plan.splitlines():
        ls = line.strip()
        i = ls.find("Window [")
        if i < 0 or ls[:i].strip(" +-*:("):
            continue
        groups = ls[i + len("Window "):].split("], [")
        if len(groups) >= 3:
            continue
        if len(groups) == 1 or " ASC" in groups[1] or " DESC" in groups[1]:
            out.append(ls[:140])
    return out


# Queries allowed to show ArrowEvalPython / pandas-iterator nodes (the
# declared Python seams: Arrow-batched, never row-at-a-time).
ARROW_ALLOWED = {
    "pandas_udf_token_count",
    "multimodal_decode_stub",
    "multimodal_meta",
    "media_header_parse",
    "wav_audio_decode",  # real stdlib WAV synth+decode, mapInPandas x2
    "png_image_decode",  # real stdlib PNG synth+decode, mapInPandas x2
    "png_resize_nearest",  # real decode + nearest resample, mapInPandas x2
    "video_frame_sample",  # raw-frame slicing, mapInPandas x2
    "doc_chunks_udtf",
    "arrow_doc_lengths",
}


def _batch_specs():
    from eventstream_fanout_spark.plans.registry import QUERIES

    return [
        s
        for s in QUERIES.values()
        if "streaming" not in s.tags or s.name in (
            # streaming-tagged but batch-evaluated (no stream started)
            "bad_records_quarantine",
            "schema_drift_report",
        )
    ]


@pytest.mark.parametrize(
    "spec", _batch_specs(), ids=lambda s: s.name
)
def test_plan_hygiene(spark, spec):
    df = spec.fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{spec.name}: unbounded cartesian in plan"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert spec.name in BNLJ_ALLOWED, (
            f"{spec.name}: BroadcastNestedLoopJoin outside the "
            "constant-broadcast allowlist"
        )
    assert "BatchEvalPython" not in plan, (
        f"{spec.name}: row-at-a-time Python UDF in the hot path"
    )
    if any(
        node in plan
        for node in ("ArrowEvalPython", "MapInPandas", "MapInArrow")
    ):
        assert spec.name in ARROW_ALLOWED, (
            f"{spec.name}: undeclared Python seam"
        )
    gw = _global_windows(plan)
    if gw:
        assert spec.name in GLOBAL_WINDOW_ALLOWED, (
            f"{spec.name}: unpartitioned Window outside the "
            f"bounded-relation allowlist: {gw[0]}"
        )
