#!/usr/bin/env python3
"""Regenerate PLANS.md — formatted physical plans for the queries whose
plan shape carries the scale claims (run after plan-affecting changes)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = {
    "flagship_enrich": "the reference pipeline: pushdown scan + broadcast "
    "left join, zero fact-side shuffles",
    "q3_shipping_priority": "3-way join: filters pushed to every scan, "
    "dimensions broadcast, single agg shuffle",
    "window_tumbling_10m": "partial (map-side) aggregation before the one "
    "shuffle on (window, key)",
    "minhash_lsh_pairs": "bucket-local LSH self-join: the shuffle key is "
    "(band, band_hash), never all-pairs",
    "ann_cosine_topk": "broadcast query + TakeOrderedAndProject top-k: no "
    "global sort",
    "simhash_near_pairs": "round 2: pigeonhole bit-band equi-join "
    "candidates (no BroadcastNestedLoopJoin), exact Hamming filter on "
    "candidates only",
    "ngram_jaccard_dups": "round 2: exact Jaccard restricted to LSH "
    "candidate pairs — two equi-joins keyed by doc id, never quadratic "
    "in hot shingles",
    "q21_waiting_suppliers": "round 2: EXISTS/NOT EXISTS decorrelated to "
    "per-order distinct counts — one extra agg + equi-join instead of "
    "two correlated scans",
    "sequence_packing": "round 2: per-bucket window cumsum — 256-way "
    "parallel packing, no global sort",
    "ann_ivf_topk": "round 3: IVF-Flat — broadcast centroid assignment "
    "(pure map + argmax agg), probe joins restrict the scan to nprobe "
    "inverted lists; no corpus self-join",
    "boilerplate_block_removal": "round 3: three equi-shuffles (block "
    "count, join-back on block key, per-doc reassembly), each "
    "partial-aggregated — the C4 rule without a quadratic pass",
    "corpus_shuffle_order": "round 3: global order without a global "
    "window — parallel per-bucket row_number + a 256-row offset "
    "window, broadcast-joined back",
    "bitmap_distinct_users": "round 3: exact distinct via OR-mergeable "
    "bitmaps — two partial-agg levels, no count-distinct expand",
    "training_export_pipeline": "round 3: the full export composition "
    "— every stage equi-keyed or broadcast, global order/cumsum via "
    "bucket-prefix two-level windows, no single-partition stage",
    "vocab_coverage": "round 4: per-bucket top-200 prune before the "
    "global rank window — the single-partition window is bounded at "
    "51.2k candidate rows regardless of vocabulary size",
    "lsh_bucket_stats": "round 4: the salting evidence — bucket sizes "
    "from one partial-agg shuffle; max_task_rows is the bound the "
    "hot-bucket salt split enforces",
    "incremental_dedup_sim": "round 4: incremental dedup as a batch "
    "plan — store and within-batch rejections are band equi-joins "
    "(left_semi/left_anti), never all-pairs",
    "wav_audio_decode": "round 4: two Arrow-batched mapInPandas seams "
    "(synthesize real WAV bytes, decode with the real parser) — "
    "partition-parallel, zero shuffles",
    "ann_pq_adc_topk": "round 5: PQ encode via broadcast 64-row "
    "codebook + argmax agg, ADC via broadcast 64-entry distance table "
    "— two BroadcastHashJoins, per-doc work 8 lookups, exact BIGINT",
    "session_concurrency_sweep": "round 5: two-level parallel "
    "sweep-line — the big cumsum window is partitioned by hour bin; "
    "only per-bin totals cross the bounded carry window",
    "weighted_systematic_sample": "round 5: token-weighted systematic "
    "sample — 256-bucket prefix scan + broadcast 1-row total; integer "
    "boundary arithmetic, no global window over the corpus",
    "cdc_variant_props": "round 5: VARIANT decode on the CDC envelope "
    "path — pure per-row projection chain, zero Exchange",
    "ann_pq_persisted_topk": "round 6: the persisted-index probe — "
    "stored-codes scan + broadcast 64-entry distance table; NO encode "
    "subtree (the only embedding touch is the 1-row query vector and "
    "the label join)",
    "ann_ivfpq_persisted_topk": "round 6: IVF-PQ — the broadcast "
    "coarse-probe result dynamic-partition-prunes the codes scan on "
    "list_id (dynamicpruningexpression on the FileScan)",
    "bm25_keyword_search": "round 6/7: BM25 over the persisted "
    "inverted index — query terms reach the postings scan as a pushed "
    "IN filter; the documents table is absent from the plan, and "
    "since round 7 so is every per-document relation (dl rides the "
    "posting rows; stats is a per-generation rollup)",
    "proximity_search_within_k": "round 6: NEAR/3 via the bucketed "
    "range-join pattern — equi-join on (doc_id, position bucket) with "
    "the window filter on candidates only, no per-doc quadratic join",
    "cms_token_counts": "round 6: explicit count-min sketch — ONE "
    "corpus scan explodes all hash-row cells into a single partial-agg "
    "groupBy; estimates are broadcast lookups",
    "bloom_decontamination_prefilter": "round 6: explicit Bloom — "
    "1-row broadcast bitmap tested per shingle; exact verify joins "
    "beside it so the FP count is an output",
    "ann_pq_persisted_batch_topk": "round 7: the IVF-PRUNED batch "
    "probe — each query's coarse ranking yields broadcast (qid, list) "
    "probe pairs that dynamic-partition-prune the ONE codes scan on "
    "list_id (dynamicpruningexpression on the FileScan); serving cost "
    "per batch is the touched lists' codes, not the corpus",
    "ann_pq_persisted_fitted_topk": "round 7: fit -> persist -> probe "
    "— the probe plan reads only the stored codes/codebook/centroids "
    "tables (the centroids happen to be k-means-fitted artifacts); no "
    "fit and no encode subtree at query time",
    "bm25_batch_search": "round 7: batch BM25 serving — the union of "
    "the batch's terms is ONE pushed IN filter on the single postings "
    "scan; (qid, tok) mapping, merge-on-read df and folded stats all "
    "ride as broadcasts; per-qid window top-k",
    "hybrid_batch_search_rrf": "round 7: batch hybrid serving — the "
    "whole fused plan touches exactly TWO index relations (one "
    "term-filtered postings scan, one DPP-pruned codes scan); "
    "rankings fuse by reciprocal-rank sums with a per-qid window",
    "centroid_classifier_report": "round 12: fitted-model scoring — "
    "the labels x dim centroid table broadcasts (BroadcastExchange on "
    "the fit subtree); the corpus side is one exploded scan with "
    "partial aggregation, so scoring cost is linear in the corpus "
    "with a constant-size model",
    "key_skew_report": "round 12: the skew diagnostic itself stays "
    "skew-proof — per-key counts partial-aggregate map-side, the "
    "top-k is TakeOrdered (no global sort), and the one-row global "
    "stats side broadcasts",
    "kmeans_lloyd_report": "round 13: seeding is a distributed "
    "TakeOrderedAndProject (the r12 corpus-wide window sort is gone); "
    "each Lloyd round broadcasts ONE packed row of k centroids "
    "against one corpus scan (array_min argmin — a pure projection, "
    "no per-vector window) and shuffles only k x dims partial sums "
    "for the update — no corpus-side shuffle anywhere in the fit",
    "pca_stratified_sample": "round 13: exact deciles with no global "
    "window — range repartition + per-partition-id row_number "
    "(distributed window) + broadcast partition offsets; the NTILE "
    "bucket is integer arithmetic on (rank, N)",
    "skew_adaptive_band_join": "round 13: the measured max bucket "
    "picks the join posture — this plan is the UNSALTED branch "
    "(sf0.1 buckets sit under HOT_BUCKET_CAP); on skewed input the "
    "same query plans the lossless salt explode "
    "(test_skew_measurement_picks_join_posture pins both)",
    "bpe_train_iterative": "round 12 continuation: one corpus-sized "
    "word count, then every merge round is vocab-partitioned window "
    "work (lead/lag/row_number over word) + a vocab-sized join — "
    "localCheckpoint truncation keeps the plan constant-size per "
    "round",
    "ngram_lm_fit": "round 13 continuation: one corpus pass into "
    "map-side-combinable (lang, bigram) partials, context/vocab "
    "derive from vocab-sized tables, top-30 is a distributed "
    "TakeOrderedAndProject — no global window, no corpus re-scan",
    "lm_perplexity_bucket": "round 13 continuation: scoring pass "
    "shuffle-joined to the vocab-bounded LM on (lang, bigram); "
    "per-language thresholds are a broadcast |langs|-row side — "
    "CCNet bucketing with no global quantile sort",
    "unigram_train_iterative": "round 13 continuation: after one "
    "corpus-sized word count every Viterbi DP layer is a vocab-sized "
    "join against the piece table (groupBy argmin, no windows) and "
    "the backtrace walks <=12 vocab-sized joins — localCheckpoint "
    "truncation per layer, integer-exact costs",
}


def main() -> None:
    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [
        "# PLANS — physical-plan evidence for the scale claims "
        "(sf0.1, AQE on)",
        "",
        "Generated by tools/dump_plans.py; regenerate after "
        "plan-affecting changes.",
        "",
    ]
    for name, why in PICKS.items():
        df = QUERIES[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        head = plan.split("\n\n")[0]
        scans = [
            line.strip()
            for line in plan.splitlines()
            if ("PushedFilters" in line and "[]" not in line)
            or "ReadSchema" in line
        ]
        out.append(f"## {name}\n\n*{why}*\n\n```\n{head}\n```\n")
        if scans:
            out.append("Scan details:\n```")
            out.extend(scans[:10])
            out.append("```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
