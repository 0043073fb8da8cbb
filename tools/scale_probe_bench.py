"""Measured crossover for the round-7 serving-path redesigns
(VERDICT r7 item 2).

At fixture scale the two redesigns were NEGATIVE-to-neutral and
justified only asymptotically:

* the doclens-free BM25 probe (postings carry a denormalized ``dl``;
  stats is a per-generation rollup) vs the round-6 shape that joined
  the full per-document ``doclens`` relation twice per probe;
* the IVF-pruned batch ANN probe (per-query coarse ranking -> (qid,
  list) broadcast -> partition-pruned codes scan) vs the unpruned
  full-codes scan.

This tool synthesizes a deterministic xMULT corpus by replicating the
sf tables with disjoint id offsets (seeded replication, generated
in-plan — ``/root/testdata`` is never written), builds each index ONCE
into a temp dir, and times the competing probe shapes on the SAME
stored artifacts (median of N timed runs after a warmup run that
absorbs one-time planning/broadcast costs).  Output: one JSON line;
PERF.md records the table.

Round 11 (VERDICT r9 item 8) adds mode families, selected by
``SCALE_MODES`` (comma list, default ``probe``):

* ``probe``    — the original r7/r8 comparisons (denorm-vs-doclens
  BM25, pruned-vs-full ANN);
* ``filtered`` — filtered vs unfiltered ANN probe across predicate
  selectivities, plus the r9 probe-time coverage guard's cost (the
  same probe with a guard-free bench-only comparator);
* ``maint``    — delta-shaped erasure vs full index rebuild, and
  fixed-size upsert cost (store-size scaling read across MULT runs);
* ``hotterm``  — the hot-term-bounded BM25 probe vs the unbounded
  merged probe on stop-word-shaped terms;
* ``substr``   — the ExactSubstr duplicated-span chain (shingle
  groupBy + hash equi-join) over the replicated corpus;
* ``classify`` — round-12 fitted classifiers: token-weight lang-id
  and nearest-centroid fit+score wall time at xMULT;
* ``graph``    — round-12 domain PageRank: per-replica-salted corpus
  (graph grows linearly with the corpus) edge-derivation + 5
  integer rank iterations;
* ``graphinc`` — round-13 incremental PageRank maintenance (requires
  ``graph`` in MODES too): fixed 1x/8 delta refreshed through
  streaming/graph_ingest.py against the xMULT base store, vs the
  full rebuild — the refresh-∝-delta claim measured;
* ``diag``     — round-12 diagnostics: key_skew_report and the
  minute->hour->day rollup cascade at xMULT.

Run detached (tmux) — the index builds dominate wall time:
    SCALE_MULT=100 SCALE_MODES=probe,filtered,maint,hotterm,substr \\
        python tools/scale_probe_bench.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eventstream_fanout_spark.session import get_spark  # noqa: E402
from eventstream_fanout_spark.sources.tables import load_table  # noqa: E402

SF = os.environ.get("SCALE_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_MULT", "100"))
RUNS = int(os.environ.get("SCALE_RUNS", "3"))
MODES = set(os.environ.get("SCALE_MODES", "probe").split(","))
OFFSET = 10_000_000  # replica id stride — replicas never collide

RARE_TERMS = ["dup"]                      # ~5% df — the common probe
HOT_TERMS = ["spark", "window", "join"]   # ~77-80% df — the worst case


def timed(fn, runs=RUNS):
    fn()  # warmup: plan + broadcast costs paid once, like a server
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def bm25_topk_doclens_shape(spark, index_path, terms, k):
    """BENCH-ONLY replica of the ROUND-6 probe shape (the comparator;
    not a product code path): df merge-on-read from the term-filtered
    scan, but ``dl`` joined from the full per-document doclens
    relation and (n_docs, total_len) aggregated from a SECOND doclens
    scan — the two corpus-length reads the round-7 denormalization
    removed (operators/text_index.py module doc)."""
    from eventstream_fanout_spark.functions.core import dsum
    from eventstream_fanout_spark.operators.text_index import (
        _merged_vocab,
        bm25_score_expr,
    )

    postings = (
        spark.read.parquet(f"{index_path}/postings")
        .where(F.col("tok").isin(terms))
        .drop("dl")  # the r6 layout had no denormalized dl
    )
    doclens = spark.read.parquet(f"{index_path}/doclens")
    vocab = _merged_vocab(postings)
    stats = doclens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    scored = (
        postings.join(doclens.select("doc_id", "dl"), "doc_id")
        .join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", bm25_score_expr().alias("sc"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            dsum(F.col("sc"), "bm25_score"),
        )
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(k)
    )


def pq_filtered_noguard_shape(spark, index_path, query, k, attr_pred, nprobe):
    """BENCH-ONLY replica of ``pq_filtered_topk`` WITHOUT the r9
    probe-time coverage guard (the comparator isolating the guard's
    list-local anti-join cost; not a product code path)."""
    from eventstream_fanout_spark.functions.vectors import cosine
    from eventstream_fanout_spark.operators.ann_index import (
        adc_scores_from_index,
        read_index,
    )

    codes, codebook, centroids = read_index(spark, index_path)
    attrs = spark.read.parquet(f"{index_path}/attrs")
    probes = (
        query.select(F.col("embedding").alias("qe"))
        .crossJoin(F.broadcast(centroids))
        .select("cid", cosine(F.col("qe"), F.col("ce")).alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("probe_cid"))
    )
    codes = codes.join(
        F.broadcast(probes), F.col("list_id") == F.col("probe_cid")
    ).select("vec_id", "list_id", "codes")
    attrs = attrs.join(
        F.broadcast(probes), F.col("list_id") == F.col("probe_cid")
    )
    allowed = attrs.where(attr_pred).select("vec_id")
    codes = codes.join(allowed, "vec_id", "left_semi")
    return (
        adc_scores_from_index(codes, codebook, query)
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
    )


def main():
    from eventstream_fanout_spark.operators.ann_index import (
        build_attr_store,
        build_pq_index,
        pq_batch_probe_topk,
        pq_filtered_topk,
        pq_probe_topk,
    )
    from eventstream_fanout_spark.operators.text_index import (
        bm25_topk_bounded,
        bm25_topk_merged,
        build_text_index,
    )

    spark = get_spark(app_name="scale-probe-bench")
    rep = spark.range(MULT).select(F.col("id").alias("k"))

    # the sf tables are single parquet files: without an explicit
    # repartition the replicate-and-build pipeline would run in ONE
    # task (scan parallelism = file count) — repartition the cheap
    # pre-explode rows so the heavy tokenize/encode work fans out
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    big_docs = (
        docs.crossJoin(rep)
        .repartition(64)
        .select(
            (F.col("doc_id") + F.col("k") * OFFSET).alias("doc_id"),
            "text",
        )
    )
    emb = load_table(spark, SF, "embeddings")
    big_emb = (
        emb.crossJoin(rep)
        .repartition(64)
        .select(
            (F.col("vec_id") + F.col("k") * OFFSET).alias("vec_id"),
            "embedding",
        )
    )
    big_labels = (
        emb.crossJoin(rep)
        .repartition(64)
        .select(
            (F.col("vec_id") + F.col("k") * OFFSET).alias("vec_id"),
            "label",
        )
    )

    need_text = MODES & {"probe", "hotterm", "maint", "ingestgate"}
    need_ann = MODES & {"probe", "filtered", "maint"}
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    tpath, apath = f"{tmp}/tidx", f"{tmp}/ann"

    res = {
        "sf_dir": SF,
        "mult": MULT,
        "modes": sorted(MODES),
        "load_avg": os.getloadavg(),
    }
    if need_text:
        t0 = time.perf_counter()
        build_text_index(spark, big_docs, tpath)
        res["build_text_s"] = round(time.perf_counter() - t0, 1)
        res["n_docs"] = big_docs.count()
    if need_ann:
        t0 = time.perf_counter()
        build_pq_index(
            spark, emb, apath, corpus=big_emb.where(F.col("vec_id") != 0)
        )
        res["build_ann_s"] = round(time.perf_counter() - t0, 1)
        res["n_vecs"] = big_emb.count() - 1

    q1 = emb.where(F.col("vec_id") == 0).select("embedding")

    if "probe" in MODES:
        for label, terms in (("rare", RARE_TERMS), ("hot", HOT_TERMS)):
            res[f"bm25_{label}_denorm_s"] = timed(
                lambda: bm25_topk_merged(spark, tpath, terms, 10).collect()
            )
            res[f"bm25_{label}_doclens_s"] = timed(
                lambda: bm25_topk_doclens_shape(
                    spark, tpath, terms, 10
                ).collect()
            )
        queries = emb.where(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= 8)
        ).select(F.col("vec_id").alias("qid"), "embedding")
        res["ann_batch_pruned_s"] = timed(
            lambda: pq_batch_probe_topk(
                spark, apath, queries, 10, nprobe=2
            ).collect()
        )
        res["ann_batch_full_s"] = timed(
            lambda: pq_batch_probe_topk(
                spark, apath, queries, 10, nprobe=None
            ).collect()
        )
        res["ann_single_pruned_s"] = timed(
            lambda: pq_probe_topk(spark, apath, q1, 10, nprobe=2).collect()
        )
        res["ann_single_full_s"] = timed(
            lambda: pq_probe_topk(
                spark, apath, q1, 10, nprobe=None
            ).collect()
        )

    if "filtered" in MODES:
        t0 = time.perf_counter()
        build_attr_store(spark, big_labels, apath)
        res["build_attrs_s"] = round(time.perf_counter() - t0, 1)
        res["filt_unfiltered_s"] = timed(
            lambda: pq_probe_topk(spark, apath, q1, 10, nprobe=2).collect()
        )
        # selectivity sweep: ~12% / ~37% / 100% of rows pass
        for label, pred in (
            ("sel1", F.col("label") == 3),
            ("sel3", F.col("label").isin(1, 3, 5)),
            ("sel8", F.col("label") >= 0),
        ):
            res[f"filt_{label}_s"] = timed(
                lambda: pq_filtered_topk(
                    spark, apath, q1, 10, pred, nprobe=2
                ).collect()
            )
            res[f"filt_{label}_noguard_s"] = timed(
                lambda: pq_filtered_noguard_shape(
                    spark, apath, q1, 10, pred, nprobe=2
                ).collect()
            )

    if "maint" in MODES:
        from eventstream_fanout_spark.streaming.ann_ingest import (
            upsert_vectors,
        )
        from eventstream_fanout_spark.streaming.text_ingest import (
            delete_docs,
        )

        # (a) WORST-CASE delta erasure: single-generation store, the
        # doomed ids spread across every partition — the eraser must
        # rewrite the whole generation, so delta CANNOT win here (the
        # honest bound; rebuild is one pass, delta is two stores'
        # rewrites plus the correction aggregates)
        doomed = [
            int(r["doc_id"])
            for r in big_docs.where(F.col("doc_id") % 97 == 11)
            .select("doc_id")
            .collect()
        ]
        res["erase_n_docs"] = len(doomed)
        t0 = time.perf_counter()
        delete_docs(spark, tpath, doomed)
        res["erase_delta_worstcase_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        build_text_index(
            spark,
            big_docs.where(F.col("doc_id") % 97 != 11),
            f"{tmp}/tidx_rebuild",
        )
        res["erase_rebuild_s"] = round(time.perf_counter() - t0, 1)

        # (b) the INTENDED regime — generational store, erasure ids
        # concentrated in one generation (a deletion request is
        # usually recent / source-scoped): build 10 generations of 10
        # replicas each, erase ~0.1% of docs all living in the last
        # generation — cost should track the touched generation, not
        # the store
        from eventstream_fanout_spark.streaming.text_ingest import (
            streaming_text_index_sink,
        )

        gens = 10
        per = max(MULT // gens, 1)
        gdoc = lambda g: big_docs.where(  # noqa: E731
            (F.col("doc_id") >= g * per * OFFSET)
            & (F.col("doc_id") < (g + 1) * per * OFFSET)
        )
        tpath2 = f"{tmp}/tidx_gen"
        build_text_index(spark, gdoc(0), tpath2)
        sink = streaming_text_index_sink(
            tpath2, enforce_unique_doc_ids=False
        )
        for g in range(1, gens):
            sink(gdoc(g), g)
        doomed2 = [
            int(r["doc_id"])
            for r in gdoc(gens - 1)
            .where(F.col("doc_id") % 97 == 11)
            .select("doc_id")
            .collect()
        ]
        res["erase_gen_n_docs"] = len(doomed2)
        t0 = time.perf_counter()
        delete_docs(spark, tpath2, doomed2)
        res["erase_delta_1of10gens_s"] = round(
            time.perf_counter() - t0, 1
        )

        # fixed-size upsert on a MULT-sized store: compare across MULT
        # runs to read the store-size scaling of the erase+re-encode
        # carry label: when the `filtered` mode also ran, the index
        # has an attrs store and the (fail-closed) sink demands it
        upd = emb.where(
            (F.col("vec_id") % 10 == 4) & (F.col("vec_id") > 20)
        ).select(
            "vec_id",
            F.transform("embedding", lambda x: x * F.lit(0.5)).alias(
                "embedding"
            ),
            "label",
        )
        res["upsert_n_vecs"] = upd.count()
        t0 = time.perf_counter()
        upsert_vectors(spark, apath, upd, batch_id=777)
        res["upsert_fixed_batch_s"] = round(time.perf_counter() - t0, 1)

    if "hotterm" in MODES:
        res["hot_unbounded_s"] = timed(
            lambda: bm25_topk_merged(spark, tpath, HOT_TERMS, 10).collect()
        )
        res["hot_bounded_s"] = timed(
            lambda: bm25_topk_bounded(
                spark, tpath, RARE_TERMS + HOT_TERMS, 10, 0.5
            ).collect()
        )
        res["hot_rare_via_bound_s"] = timed(
            lambda: bm25_topk_bounded(
                spark, tpath, RARE_TERMS, 10, 0.5
            ).collect()
        )

    if "ingestgate" in MODES:
        import shutil

        from eventstream_fanout_spark.streaming import text_ingest as ti
        from eventstream_fanout_spark.streaming.text_ingest import (
            _check_new_doc_ids,
        )

        # ids beyond any replica stride (k * OFFSET + doc_id)
        fresh = spark.range(
            100_000_000_000, 100_000_005_000
        ).select(F.col("id").alias("doc_id"))
        res["gate_auto_s"] = timed(
            lambda: _check_new_doc_ids(spark, tpath, fresh, 7)
        )
        saved = ti._IDBLOOM_MIN_CORPUS
        ti._IDBLOOM_MIN_CORPUS = 0  # force the bloom path
        res["gate_bloom_forced_s"] = timed(
            lambda: _check_new_doc_ids(spark, tpath, fresh, 7)
        )
        ti._IDBLOOM_MIN_CORPUS = saved
        # remove the blooms: the gate falls back to the full anti-join
        shutil.rmtree(f"{tpath}/idbloom")
        res["gate_fullscan_s"] = timed(
            lambda: _check_new_doc_ids(spark, tpath, fresh, 7)
        )

    if "substr" in MODES:
        from eventstream_fanout_spark.plans.dedup_queries import (
            _dup_token_spans,
        )

        res["substr_spans_s"] = timed(
            lambda: _dup_token_spans(big_docs)[1].count(), runs=1
        )

    if "listskew" in MODES:
        # VERDICT r11 item 5: per-list row-count skew + the split
        # payoff.  Skew RATIOS are replication-invariant (each replica
        # multiplies every list equally), so the ratio here equals the
        # sf-fixture ratio at any MULT; the xMULT run proves the
        # ABSOLUTE hot-list cost and the split op's cost/payoff at
        # scale.  Requires the `probe` or `filtered` mode's ANN build
        # (need_ann) — build one here if neither ran.
        from eventstream_fanout_spark.streaming.ann_ingest import (
            split_list,
        )

        if not need_ann:
            t0 = time.perf_counter()
            build_pq_index(
                spark, emb, apath,
                corpus=big_emb.where(F.col("vec_id") != 0),
            )
            res["build_ann_s"] = round(time.perf_counter() - t0, 1)
        counts = (
            spark.read.parquet(f"{apath}/codes")
            .groupBy("list_id").count().collect()
        )
        per = sorted(
            (int(r["list_id"]), int(r["count"])) for r in counts
        )
        vals = [c for _, c in per]
        res["listskew_counts"] = dict(per)
        res["listskew_max_over_mean"] = round(
            max(vals) * len(vals) / sum(vals), 3
        )
        hot = max(per, key=lambda t: (t[1], -t[0]))[0]
        # probe WITH the hot list: query = the hot centroid itself, so
        # nprobe=1 scans exactly the hot list before the split and its
        # nearer child after — the payoff is the halved list scan
        q_hot = (
            spark.read.parquet(f"{apath}/centroids")
            .where(F.col("cid") == hot)
            .select(F.col("ce").alias("embedding"))
            .cache()
        )
        q_hot.count()
        res["listskew_hot_probe_before_s"] = timed(
            lambda: pq_probe_topk(
                spark, apath, q_hot, 10, nprobe=1
            ).collect()
        )
        t0 = time.perf_counter()
        split_list(
            spark, apath, hot,
            big_emb.select("vec_id", "embedding"), batch_id=991,
        )
        res["listskew_split_s"] = round(time.perf_counter() - t0, 1)
        res["listskew_hot_probe_after_s"] = timed(
            lambda: pq_probe_topk(
                spark, apath, q_hot, 10, nprobe=1
            ).collect()
        )
        counts2 = (
            spark.read.parquet(f"{apath}/codes")
            .groupBy("list_id").count().collect()
        )
        vals2 = [int(r["count"]) for r in counts2]
        res["listskew_max_over_mean_after"] = round(
            max(vals2) * len(vals2) / sum(vals2), 3
        )

    if "classify" in MODES:
        # round-12 fitted classifiers: fit + score at xMULT.  The fit
        # is one partial-aggregated groupBy over the train split; the
        # score is a broadcast join (centroid) / token-keyed shuffle
        # join (lang weights) — both should scale ~linearly in corpus
        # size with constant-size models.
        from eventstream_fanout_spark.operators.classify import (
            centroid_classify,
            centroid_fit,
            token_weight_classify,
            token_weight_fit,
        )

        docs_l = load_table(spark, SF, "documents").select(
            "doc_id", "text", "lang"
        )
        big_docs_l = (
            docs_l.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("doc_id") + F.col("k") * OFFSET).alias("doc_id"),
                "text",
                "lang",
            )
        )
        tr_d = big_docs_l.where(F.col("doc_id") % 5 != 0)
        te_d = big_docs_l.where(F.col("doc_id") % 5 == 0)

        def _lang_run():
            w, p = token_weight_fit(tr_d, "lang")
            return token_weight_classify(te_d, w, p, "lang").count()

        res["classify_lang_fit_score_s"] = timed(_lang_run, runs=1)
        big_emb_l = (
            emb.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("vec_id") + F.col("k") * OFFSET).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        tr_e = big_emb_l.where(F.col("vec_id") % 5 != 0)
        te_e = big_emb_l.where(F.col("vec_id") % 5 == 0)
        res["classify_centroid_fit_score_s"] = timed(
            lambda: centroid_classify(te_e, centroid_fit(tr_e)).count(),
            runs=1,
        )

    if "graph" in MODES:
        # round-12 domain PageRank.  Plain replication would multiply
        # every shingle's df past the [DF_MIN, DF_MAX] bound and empty
        # the graph, so each replica salts its tokens (tok_k) and
        # namespaces its sources (src_k): the graph grows linearly
        # (nodes = sources x MULT) — the realistic web shape where
        # corpus and domain count grow together.
        from eventstream_fanout_spark.operators.graph import (
            cocitation_edges,
            pagerank_integer,
        )

        docs_g = load_table(spark, SF, "documents").select(
            "doc_id", "text", "source"
        )
        salted = (
            docs_g.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("doc_id") + F.col("k") * OFFSET).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                        lambda t: F.concat(
                            t, F.lit("_"), F.col("k").cast("string")
                        ),
                    ),
                    " ",
                ).alias("text"),
                F.concat(
                    F.col("source"),
                    F.lit("_"),
                    F.col("k").cast("string"),
                ).alias("source"),
            )
        )

        def _pr_run():
            nodes = salted.select("source").distinct()
            return pagerank_integer(nodes, cocitation_edges(salted)).count()

        res["pagerank_edges_rank_s"] = timed(_pr_run, runs=1)
        res["pagerank_n_nodes"] = (
            salted.select("source").distinct().count()
        )

        if "graphinc" in MODES:
            # round-13 incremental maintenance: a FIXED 1x/8 delta
            # (new docs in replica 0's token/source namespace, so the
            # touched-shingle set is delta-bounded) refreshed against
            # the xMULT base store, vs the full rebuild above.  The
            # claim under test: refresh cost ∝ delta, rebuild ∝ corpus.
            from eventstream_fanout_spark.streaming.graph_ingest import (
                ingest_graph_batch,
            )

            delta = salted.where(
                (F.col("doc_id") < OFFSET)  # replica 0 rows
                & (F.col("doc_id") % 8 == 3)
            ).select(
                (F.col("doc_id") + F.lit((MULT + 1) * OFFSET)).alias(
                    "doc_id"
                ),
                "text",
                "source",
            )
            base = salted  # the delta's ids are disjoint by offset
            gtmp = f"{tmp}/graphstore"
            t0 = time.perf_counter()
            ingest_graph_batch(spark, gtmp, base, 0)
            res["graphinc_base_build_s"] = round(
                time.perf_counter() - t0, 1
            )
            t0 = time.perf_counter()
            ingest_graph_batch(spark, gtmp, delta, 1)
            res["graphinc_refresh_s"] = round(
                time.perf_counter() - t0, 1
            )
            res["graphinc_delta_docs"] = delta.count()

    if "diag" in MODES:
        from eventstream_fanout_spark.operators.diagnostics import (
            key_skew_report,
            rollup_cascade,
        )

        ev = load_table(spark, SF, "events").select(
            "ts", "user_id", "event_type", "value"
        )
        big_ev = ev.crossJoin(rep).repartition(64).select(
            "ts",
            (F.col("user_id") + F.col("k") * OFFSET).alias("user_id"),
            "event_type",
            "value",
        )
        res["skew_report_s"] = timed(
            lambda: key_skew_report(big_ev, "user_id").count()
        )
        res["rollup_cascade_s"] = timed(
            lambda: rollup_cascade(big_ev).count()
        )

    if "cluster" in MODES:
        # round-12 continuation: full Lloyd k-means (seed + 3 rounds +
        # final assign + report).  Each round is one broadcast-assign
        # corpus pass + a k x dims shuffle — wall time should scale
        # ~linearly in corpus size with k, dims, rounds constant.
        from eventstream_fanout_spark.operators.clustering import (
            kmeans_report,
        )

        res["kmeans_fit_report_s"] = timed(
            lambda: kmeans_report(big_emb).count(), runs=1
        )
        res["kmeans_n_vecs"] = big_emb.count()

    if "bpe" in MODES:
        # round-12 continuation: the BPE trainer's two cost regimes.
        # Plain replication multiplies the CORPUS but not the vocab —
        # the corpus-sized word count should scale with MULT while the
        # 8 merge rounds stay constant (the whole point of training on
        # the aggregated vocabulary).  Salted replication namespaces
        # each replica's words, growing the VOCAB by MULT — the merge
        # rounds' own scaling, isolated.
        from eventstream_fanout_spark.operators.tokenizer import (
            bpe_train,
            word_counts,
        )

        res["bpe_train_corpus_s"] = timed(
            lambda: bpe_train(word_counts(big_docs)).count(), runs=1
        )
        wc_salted = (
            word_counts(docs)
            .crossJoin(rep)
            .repartition(64)
            .select(
                F.concat(
                    F.col("word"), F.lit("q"), F.col("k").cast("string")
                ).alias("word"),
                "wc",
            )
        )
        res["bpe_train_salted_vocab_s"] = timed(
            lambda: bpe_train(wc_salted).count(), runs=1
        )
        res["bpe_vocab_plain"] = word_counts(big_docs).count()
        res["bpe_vocab_salted"] = wc_salted.count()

    if "lm" in MODES:
        # round-13 continuation: the n-gram LM family's two cost
        # regimes.  Fit is one corpus pass into (lang, bigram)
        # partials (vocab-bounded output); scoring is a second corpus
        # pass joined against that vocab-bounded LM — both should
        # scale ~linearly in MULT.  Erasure is a NEGATIVE delta over
        # a fixed 1x/8 doomed slice: its cost must stay ~flat across
        # MULT (∝ doomed docs, not store size) while a full refit
        # scales with the corpus — the delta-shaped claim, measured.
        from eventstream_fanout_spark.operators.lm import (
            bigram_counts,
            context_counts,
            doc_fluency_scores,
            vocab_sizes,
        )
        from eventstream_fanout_spark.streaming.lm_store import (
            erase_lm_docs,
            ingest_lm_batch,
            serve_bigram_counts,
        )

        docs_lm = load_table(spark, SF, "documents").select(
            "doc_id", "text", "lang"
        )
        big_docs_lm = (
            docs_lm.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("doc_id") + F.col("k") * OFFSET).alias("doc_id"),
                "text",
                "lang",
            )
        )
        tr = big_docs_lm.where(F.col("doc_id") % 2 == 0)

        def _lm_fit():
            big = bigram_counts(tr)
            return (
                big.count()
                + context_counts(big).count()
                + vocab_sizes(tr).count()
            )

        res["lm_fit_s"] = timed(_lm_fit, runs=1)

        def _lm_score():
            big = bigram_counts(tr)
            return doc_fluency_scores(
                big_docs_lm, big, context_counts(big), vocab_sizes(tr)
            ).count()

        res["lm_score_s"] = timed(_lm_score, runs=1)

        def _lm_kn3_score():
            # r14: trigram-KN scoring, same materialization shape as
            # _lm_score (per-doc davg) — the "cost matches bigram
            # scoring" claim, measured
            from eventstream_fanout_spark.functions.core import davg
            from eventstream_fanout_spark.operators.lm import (
                kn_trigram_terms,
            )

            return (
                kn_trigram_terms(big_docs_lm, tr)
                .groupBy("doc_id", "lang")
                .agg(davg(F.col("term"), "s_kn3"))
                .count()
            )

        res["lm_kn3_score_s"] = timed(_lm_kn3_score, runs=1)

        lroot = f"{tmp}/lmstore"
        t0 = time.perf_counter()
        ingest_lm_batch(spark, lroot, tr, 0)
        res["lm_store_build_s"] = round(time.perf_counter() - t0, 1)
        doomed = tr.where(
            (F.col("doc_id") < OFFSET) & (F.col("doc_id") % 8 == 2)
        )
        t0 = time.perf_counter()
        erase_lm_docs(spark, lroot, doomed, 1)
        res["lm_erase_delta_s"] = round(time.perf_counter() - t0, 1)
        res["lm_erase_doomed_docs"] = doomed.count()
        t0 = time.perf_counter()
        serve_bigram_counts(spark, lroot, 1).count()
        res["lm_serve_merged_s"] = round(time.perf_counter() - t0, 1)

    if "lmcompact" in MODES:
        # round-14: manifest-committed compaction payoff.  A
        # long-running ingest accumulates per-batch delta partitions;
        # serving merges all of them, so its task/file count tracks
        # the DELTA COUNT, not the data size.  Measure serve latency
        # with NDELTA live partitions, the fold cost, serve latency
        # against the single frozen generation, and pin exactness
        # (served row count unchanged).  The graph postings store
        # shares compact_table_manifest, so this measures both.
        from eventstream_fanout_spark.streaming.lm_store import (
            compact_lm_store,
            ingest_lm_batch as _ing,
            serve_bigram_counts as _srv,
        )

        docs_lc = load_table(spark, SF, "documents").select(
            "doc_id", "text", "lang"
        )
        big_docs_lc = (
            docs_lc.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("doc_id") + F.col("k") * OFFSET).alias("doc_id"),
                "text",
                "lang",
            )
        )
        NDELTA = 32
        croot = f"{tmp}/lmcstore"
        t0 = time.perf_counter()
        for b in range(NDELTA):
            _ing(
                spark,
                croot,
                big_docs_lc.where(
                    F.pmod(F.col("doc_id"), NDELTA) == b
                ),
                b,
            )
        res["lmc_ingest_deltas_s"] = round(time.perf_counter() - t0, 1)
        res["lmc_ndelta"] = NDELTA

        def _serve_all():
            return _srv(spark, croot, NDELTA - 1).count()

        n_before = _serve_all()
        res["lmc_serve_live_parts_s"] = timed(_serve_all, runs=3)
        t0 = time.perf_counter()
        compact_lm_store(spark, croot, upto_batch_id=NDELTA)
        res["lmc_compact_s"] = round(time.perf_counter() - t0, 1)
        n_after = _serve_all()
        res["lmc_serve_frozen_s"] = timed(_serve_all, runs=3)
        res["lmc_rows_match"] = bool(n_before == n_after)

    if "maxsim" in MODES:
        # round-14 continuation: multi-vector MaxSim exact vs the
        # chunk-LSH two-stage at xMULT corpus.  The claim under test:
        # exact cost tracks corpus size (|corpus| x 16 chunk cosines)
        # while the pruned path's stage-2 cost tracks the CANDIDATE
        # count (a ~constant fraction under random hyperplanes), so
        # the gap widens with MULT.  Matryoshka likewise: prefix pass
        # reads 1/4 of the vector elements, rerank is candidate-sized.
        from eventstream_fanout_spark.operators.multivector import (
            chunk_candidates,
            maxsim_pruned_topk,
            maxsim_topk,
        )
        from eventstream_fanout_spark.operators.similarity import (
            brute_force_topk,
        )

        big_vecs = (
            emb.crossJoin(rep)
            .repartition(64)
            .select(
                (F.col("vec_id") + F.col("k") * OFFSET).alias("vec_id"),
                "embedding",
                "label",
            )
            .where(F.col("vec_id") != 0)
        )
        big_vecs.cache().count()
        qv = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe")
        )
        res["maxsim_exact_s"] = timed(
            lambda: maxsim_topk(big_vecs, qv, 10).collect()
        )
        res["maxsim_pruned_s"] = timed(
            lambda: maxsim_pruned_topk(big_vecs, qv, 10).collect()
        )
        res["maxsim_n_cands"] = chunk_candidates(big_vecs, qv).count()
        res["maxsim_n_corpus"] = big_vecs.count()

        # the stored-index serve path: chunk buckets computed ONCE at
        # build, stage 1 = partition-pruned scan of the chunk store
        from eventstream_fanout_spark.operators.mv_index import (
            build_mv_index,
            mv_probe_topk,
        )

        mvpath = f"{tmp}/mvidx"
        t0 = time.perf_counter()
        build_mv_index(spark, emb, mvpath, corpus=big_vecs)
        res["mv_build_s"] = round(time.perf_counter() - t0, 1)
        res["mv_probe_s"] = timed(
            lambda: mv_probe_topk(spark, mvpath, qv, 10).collect()
        )

        from eventstream_fanout_spark.plans.multivector_queries import (
            MATRYOSHKA_CANDIDATES,
            PREFIX_DIM,
        )
        from eventstream_fanout_spark.functions.vectors import (
            cosine_given_bnorm,
            norm2,
        )

        qp = qv.select(
            F.slice(F.col("qe"), 1, PREFIX_DIM).alias("qpe"), F.col("qe")
        ).withColumn("qpn2", norm2(F.col("qpe"))).withColumn(
            "qn2", norm2(F.col("qe"))
        )

        def _mat_run():
            coarse = big_vecs.crossJoin(F.broadcast(qp)).select(
                "vec_id",
                "embedding",
                "qe",
                "qn2",
                cosine_given_bnorm(
                    F.slice(F.col("embedding"), 1, PREFIX_DIM),
                    F.col("qpe"),
                    F.col("qpn2"),
                ).alias("cp"),
            )
            cands = coarse.orderBy(F.desc("cp"), F.asc("vec_id")).limit(
                MATRYOSHKA_CANDIDATES
            )
            return (
                cands.select(
                    "vec_id",
                    cosine_given_bnorm(
                        F.col("embedding"), F.col("qe"), F.col("qn2")
                    ).alias("cosine"),
                )
                .orderBy(F.desc("cosine"), F.asc("vec_id"))
                .limit(10)
                .collect()
            )

        res["matryoshka_s"] = timed(_mat_run)
        res["brute_force_s"] = timed(
            lambda: brute_force_topk(big_vecs, qv, 10).collect()
        )
        big_vecs.unpersist()

    print(json.dumps(res))


if __name__ == "__main__":
    main()
