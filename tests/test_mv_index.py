"""Persisted MV (MaxSim chunk-bucket) index invariants beyond the
oracle: store-probe equals the in-plan pruned plan bit-for-bit, the
probe plan prunes the stored scan instead of re-bucketing the corpus,
erasure physically removes rows, and ingest replay is a no-op."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _corpus_query(spark):
    from eventstream_fanout_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    return emb, corpus, query


def test_store_probe_equals_inplan_pruned_and_plan_prunes(spark):
    from eventstream_fanout_spark.operators.multivector import (
        maxsim_pruned_topk,
    )
    from eventstream_fanout_spark.operators.mv_index import (
        build_mv_index,
        mv_probe_topk,
    )

    emb, corpus, query = _corpus_query(spark)
    path = tempfile.mkdtemp(prefix="mv_idx_test_")
    build_mv_index(spark, emb, path)
    probe = mv_probe_topk(spark, path, query, 10)
    inplan = [r.asDict() for r in maxsim_pruned_topk(corpus, query, 10).collect()]
    stored = [r.asDict() for r in probe.collect()]
    assert stored == inplan  # bit-identical scores, same order

    # the probe must not re-bucket stored data: lsh_bucket's md5-sign
    # subtree runs only in the tiny query-side job that computes the
    # probe buckets.  The stored scan reads `bucket` as a SORTED data
    # column with the probe's buckets PUSHED into it (r14 layout:
    # bgrp partition dirs + row-group min/max on bucket), never via a
    # bucket-computation over `chunk`.
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan
    # exactly two chunk-store scans: stage-1 candidates + stage-2 rerank
    assert plan.count("chunks") >= 2
    # stage 1's bucket probe is a pushed parquet predicate (row-group
    # skipping over the bucket-sorted files), not a post-scan join
    assert "PushedFilters: [In(bucket" in plan, plan


def test_mv_erasure_physically_removes(spark):
    from eventstream_fanout_spark.operators.mv_index import (
        build_mv_index,
        delete_mv_vectors,
        mv_probe_topk,
    )

    emb, corpus, query = _corpus_query(spark)
    path = tempfile.mkdtemp(prefix="mv_idx_erase_")
    build_mv_index(spark, emb, path)
    doomed = [r["vec_id"] for r in corpus.limit(5).collect()]
    n = delete_mv_vectors(spark, path, doomed)
    assert n > 0
    store = spark.read.parquet(f"{path}/chunks")
    assert store.where(F.col("vec_id").isin(doomed)).count() == 0
    # idempotent: a re-run touches nothing
    assert delete_mv_vectors(spark, path, doomed) == 0
    # probe still works and excludes the doomed
    got = {r["vec_id"] for r in mv_probe_topk(spark, path, query, 10).collect()}
    assert not (got & set(doomed))


def test_mv_ingest_replay_is_noop(spark):
    from eventstream_fanout_spark.operators.mv_index import (
        build_mv_index,
        ingest_mv_vectors,
    )

    emb, corpus, query = _corpus_query(spark)
    path = tempfile.mkdtemp(prefix="mv_idx_ingest_")
    build_mv_index(
        spark, emb, path, corpus=corpus.where(F.col("vec_id") % 2 == 0)
    )
    batch = corpus.where(F.col("vec_id") % 2 == 1)
    ingest_mv_vectors(spark, path, batch, 1)
    before = (
        spark.read.parquet(f"{path}/chunks")
        .groupBy("batch_id")
        .count()
        .collect()
    )
    ingest_mv_vectors(spark, path, batch, 1)  # replay
    after = (
        spark.read.parquet(f"{path}/chunks")
        .groupBy("batch_id")
        .count()
        .collect()
    )
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
