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

Run detached (tmux) — the index builds dominate wall time:
    SCALE_MULT=100 python tools/scale_probe_bench.py
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


def main():
    from eventstream_fanout_spark.operators.ann_index import (
        build_pq_index,
        pq_batch_probe_topk,
        pq_probe_topk,
    )
    from eventstream_fanout_spark.operators.text_index import (
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

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    tpath, apath = f"{tmp}/tidx", f"{tmp}/ann"

    t0 = time.perf_counter()
    build_text_index(spark, big_docs, tpath)
    t_tbuild = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    build_pq_index(
        spark, emb, apath, corpus=big_emb.where(F.col("vec_id") != 0)
    )
    t_abuild = round(time.perf_counter() - t0, 1)

    n_docs = big_docs.count()
    n_vecs = big_emb.count() - 1

    res = {
        "sf_dir": SF,
        "mult": MULT,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "build_text_s": t_tbuild,
        "build_ann_s": t_abuild,
        "load_avg": os.getloadavg(),
    }

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
    q1 = emb.where(F.col("vec_id") == 0).select("embedding")
    res["ann_single_pruned_s"] = timed(
        lambda: pq_probe_topk(spark, apath, q1, 10, nprobe=2).collect()
    )
    res["ann_single_full_s"] = timed(
        lambda: pq_probe_topk(spark, apath, q1, 10, nprobe=None).collect()
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
