#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output contract (the driver captures the LAST 2000 characters of
stdout and parses the JSON line it finds there — round 4's single
70-query line outgrew that window and the artifact recorded
``parsed: null``, VERDICT r4 item 4):

- one small ``#q <name>=<sec>`` progress line per query as it
  completes — deliberately NOT JSON-parseable, so a tail capture that
  tries each line can only ever parse the final summary (the full
  per-query record lives in stdout order and in ``bench_full.json``);
- the COMPLETE result object written to ``bench_full.json`` next to
  this script;
- a final compact summary line, guaranteed well under the capture
  window no matter how many queries register:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "sf": ..., "nq": N, "queries": {<slowest 20>}, "full": "bench_full.json"}

Execution is forced with the noop sink (full computation, no driver
materialization) so timings measure the engine, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference surface (flagship + windows + leaderboard),
# warehouse breadth (TPC-H analogues), and the north-star extension ops.
HEADLINE = [
    "flagship_enrich",
    "cdc_parse_roundtrip",
    "window_tumbling_10m",
    "window_sliding_10m_5m",
    "rolling_10m_user_count",
    "topk_leaderboard_daily",
    "global_leaderboard_top10",
    "hourly_distinct_users",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "rollup_nation_segment",
    "salted_join_counts",
    "sessionize_events",
    "conversion_funnel",
    "rank_family",
    "lag_lead_deltas",
    "pivot_event_types",
    "percentile_disc_manual",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_dups",
    "simhash_docs",
    "ann_cosine_topk",
    "ann_lsh_bucket_topk",
    "text_quality_profile",
    "doc_fingerprint_winnow",
    "multimodal_decode_stub",
    "corpus_clean_pipeline",
    "asof_click_before_purchase",
    "range_join_click_purchase_1h",
    "cdc_apply_merge",
    "gap_filled_hourly_counts",
    # real Structured Streaming executions (availableNow -> memory);
    # the reference's latency envelope is "enrichment inside a 5 s
    # micro-batch" (README.md:99) — these time a full drain
    "stream_enrich_availablenow",
    "stream_window_counts_watermark",
    # round 2 additions (wall total is NOT comparable to round 1's
    # 40-query suite — compare per-query timings across rounds)
    "simhash_near_pairs",
    "embedding_lsh_near_pairs",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q13_customer_order_distribution",
    "q16_part_supplier_counts",
    "q21_waiting_suppliers",
    # round 3 additions
    "ann_ivf_topk",
    "boilerplate_block_removal",
    "embedding_random_projection",
    "corpus_shuffle_order",
    "bitmap_distinct_users",
    "variant_props_extract",
    "training_export_pipeline",
    # round 4 additions: sandwich-checked sketch rollups (estimate +
    # exact + bound in one plan) and the LSH skew report
    "approx_quantiles_value",
    "theta_sketch_user_sets",
    "hll_daily_merge_distinct",
    "kll_daily_merge_quantiles",
    "lsh_bucket_stats",
    "vocab_coverage",
    # round-4 late additions: incremental dedup sim, real media
    # decode (Arrow seams), crawl normalization
    "incremental_dedup_sim",
    "wav_audio_decode",
    "png_image_decode",
    "html_text_extract",
    "url_canonical_dedup",
    "fuzzy_entity_match",
    "scd2_point_in_time_join",
    "ann_multiprobe_topk",
    # round 5 additions: fitted IVF, VARIANT CDC decode, LM novelty,
    # BPE merge fit, two-level sweep-line concurrency
    "ann_ivf_fitted_topk",
    "cdc_variant_props",
    "trigram_novelty_score",
    "bpe_merge_candidates",
    "session_concurrency_sweep",
    "weighted_systematic_sample",
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "ann_pq_recall_report",
    "incremental_dedup_verified_sim",
    "dq_expectations_report",
    "incremental_mv_maintenance",
    "mad_outlier_report",
    "bigram_lift_top",
    "semantic_cluster_diversity_sample",
    # round 6 additions: persisted PQ/IVF index probes (first run
    # builds the index artifact, min-of-N then measures the pure probe
    # — the amortized-build claim made measurable), the incremental
    # index-ingest sim, and the oracle-checked metrics-table profile
    "ann_pq_persisted_topk",
    "ann_ivfpq_persisted_topk",
    "ann_pq_persisted_batch_topk",
    "ann_index_ingest_sim",
    "stream_metrics_profile",
    "bm25_keyword_search",
    "text_index_ingest_sim",
    "curated_ingest_pipeline",
    "hybrid_search_rrf",
    "png_resize_nearest",
    "video_frame_sample",
    "cdc_custom_source_roundtrip",
    "bpe_apply_tokenize",
    "incremental_vector_dedup_sim",
    "bloom_decontamination_prefilter",
    "cms_token_counts",
    "phrase_search_positional",
    "proximity_search_within_k",
    # round 7 additions: fitted persisted indexes (both quantizers),
    # the batch serving probes (BM25 / hybrid RRF), the vector-dedup
    # recall report, and the full multimodal curated ingest
    "ann_pq_persisted_fitted_topk",
    "ann_pq_fitted_codebook_topk",
    "ann_pq_fully_fitted_topk",
    "bm25_batch_search",
    "hybrid_batch_search_rrf",
    "vector_dedup_recall_report",
    "curated_multimodal_ingest",
    "stream_stateful_user_totals",
    "text_index_delete_sim",
    "ann_index_delete_sim",
    "curated_erasure_sim",
    # round 8 additions: the multimodal erasure sim (all four stores +
    # both serving probes), the hot-term-bounded BM25 probe, and the
    # full maintenance-cycle (erase -> compact) sims
    "curated_multimodal_erasure_sim",
    "bm25_hot_term_bound",
    "text_index_compact_sim",
    "ann_index_compact_sim",
    "ann_binary_hamming_topk",
    "ann_binary_rerank_topk",
    "streaming_erasure_sim",
    "text_index_layout_census",
    "text_index_asof_probe",
    "ann_index_asof_sim",
    "exact_substring_spans",
    "exact_substring_dedup_cut",
    "ann_pq_filtered_topk",
    "text_index_upsert_sim",
    "ann_index_upsert_sim",
    # round 11 additions: live filtered search (delta-maintained attr
    # stores on both indexes), filtered hybrid fusion, the update-queue
    # stream sim
    "ann_filtered_live_sim",
    "bm25_filtered_search",
    "hybrid_filtered_search_rrf",
    "streaming_upsert_sim",
    "ann_recall_after_churn",
    "ann_index_refit_sim",
    "ann_pq_filtered_batch_topk",
    "bm25_filtered_batch_search",
    "ann_filtered_asof_sim",
    "text_filtered_asof_probe",
    # round 12 additions: attr-schema evolution on both live filtered
    # indexes, the IVF list split, and the streaming filtered soak
    "ann_attr_evolve_sim",
    "text_attr_evolve_sim",
    "ann_list_split_sim",
    "ann_list_merge_sim",
    "ann_filtered_soak_sim",
    "ann_attr_drop_sim",
    "text_attr_drop_sim",
    # round-12 late additions: fitted classifiers, graph authority,
    # scale diagnostics, rollup cascade
    "centroid_classifier_report",
    "centroid_classifier_confusion",
    "lang_classifier_report",
    "lang_classifier_confusion",
    "domain_pagerank",
    "key_skew_report",
    "rollup_cascade_daily",
    "knn_classifier_report",
    "rollup_incremental_sim",
    "centroid_classifier_prf",
    "lang_classifier_prf",
    "classifier_stream_scoring_sim",
    "model_asof_scoring_sim",
    "authority_weighted_sample",
    "embedding_covariance_top",
    "stream_rollup_cascade",
    "rollup_anomaly_flags",
    "knn_classifier_ivf_report",
    "curation_v2_pipeline",
    # round-12 continuation: tokenizer training, clustering, linalg
    "bpe_train_iterative",
    "bpe_store_token_stats",
    "bpe_fertility_by_lang",
    "kmeans_lloyd_report",
    "kmeans_label_purity",
    "kmeans_outlier_report",
    "kmeans_minibatch_sim",
    "kmeans_erasure_sim",
    "cluster_quota_curation",
    "stream_kmeans_refresh",
    "pca_power_loadings",
    "pca_stratified_sample",
    "kmeans_seed_quality_report",
    "kmeans_refit_sim",
    "bpe_packed_export",
]


def _calibration_queries(spark):
    """Fixed pure-compute plans (no table IO, seeded spark.range) that
    measure THE BOX, not the engine (VERDICT r8 item 2 / r9 item 6):
    identical work every round, so the ratio of this round's
    calibration times to last round's separates machine drift (shared
    VM, co-tenant load) from real engine regressions.  Three shapes:
    a codegen-bound scalar aggregate, a shuffle-bound groupBy, and a
    string/hash-bound pipeline."""
    from pyspark.sql import functions as F

    n = 50_000_000
    return {
        "cal_scalar_agg": lambda: spark.range(0, n, 1, 32).select(
            F.sum((F.col("id") * 2654435761) % 1000000007).alias("s")
        ),
        "cal_shuffle_agg": lambda: spark.range(0, n // 5, 1, 32)
        .groupBy((F.col("id") % 4096).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"), F.sum("id").alias("s")),
        "cal_string_hash": lambda: spark.range(0, n // 25, 1, 32)
        .select(F.md5(F.col("id").cast("string")).alias("h"))
        .select(F.count_distinct(F.substring("h", 1, 4)).alias("d")),
    }


def main() -> None:
    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.session import get_spark

    spark = get_spark(app_name="eventstream-fanout-bench")
    try:
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        load_start = os.getloadavg()
        timings: dict[str, float] = {}
        # warm the JVM/scan path once (not timed)
        QUERIES["count_star"].fn(spark, SF_DIR).collect()
        runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
        calibration: dict[str, float] = {}
        for cname, make in _calibration_queries(spark).items():
            cbest = None
            for _ in range(runs):
                t0 = time.perf_counter()
                make().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                cbest = dt if cbest is None else min(cbest, dt)
            calibration[cname] = round(cbest, 3)
            print(f"#cal {cname}={calibration[cname]}", flush=True)
        for name in HEADLINE:
            spec = QUERIES[name]
            best = None
            for _ in range(runs):  # min-of-N damps shared-box noise
                t0 = time.perf_counter()
                df = spec.fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            # prefixed so only the final summary line is JSON-parseable
            print(f"#q {name}={timings[name]}", flush=True)
        total = round(sum(timings.values()), 3)
        sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
        metric = (
            "headline-suite wall seconds (noop sink, "
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])"
        )
        full = {
            "metric": metric,
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
            # run metadata (VERDICT r5 item 8): PERF.md documents
            # 1.3-2x same-day idle variance on this VM — the artifact
            # records how each number was taken so cross-round
            # comparisons are self-describing
            "run_meta": {
                "runs_per_query": runs,
                "aggregation": "min-of-N per query",
                # box-speed probes (identical pure-compute work every
                # round): divide a cross-round suite ratio by the
                # calibration ratio to split machine drift from engine
                # change
                "calibration_sec": calibration,
                "cpus": os.cpu_count(),
                "load_avg_start_1m_5m_15m": [round(x, 2) for x in load_start],
                "load_avg_end_1m_5m_15m": [
                    round(x, 2) for x in os.getloadavg()
                ],
            },
        }
        with open(os.path.join(REPO_ROOT, "bench_full.json"), "w") as fh:
            json.dump(full, fh, indent=1)
        slowest = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        )
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": total,
                    "unit": "sec",
                    "sf": sf_val,
                    "nq": len(timings),
                    "queries": slowest,
                    "full": "bench_full.json",
                },
                separators=(",", ":"),
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
