"""Unit contracts for the round-12 late additions: fitted classifiers
(operators/classify.py), source-graph PageRank (operators/graph.py),
and the skew/rollup diagnostics (operators/diagnostics.py).

The sf0.01 oracle parity is covered by the registry parity tests; here
we pin semantics on CONSTRUCTED data where the signal is known —
separable classes classify perfectly, authority flows to the sink
node, the skew numbers are hand-checkable."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _emb_df(spark):
    # two separable labels in 4-d: label 0 ~ e1, label 1 ~ e2.
    rows = []
    for vid in range(20):
        label = vid % 2
        base = [0.9, 0.05, 0.0, 0.05] if label == 0 else [0.05, 0.9, 0.05, 0.0]
        jitter = (vid % 7) * 0.001
        rows.append((vid, [v + jitter for v in base], label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_centroid_classifier_separable_is_perfect(spark):
    from eventstream_fanout_spark.operators.classify import (
        centroid_classify,
        centroid_fit,
    )

    emb = _emb_df(spark)
    train = emb.where(F.col("vec_id") % 5 != 0)
    test = emb.where(F.col("vec_id") % 5 == 0)
    preds = centroid_classify(test, centroid_fit(train)).collect()
    assert len(preds) == test.count()
    assert all(r.label_pred == r.label_true for r in preds)
    assert all(r.score_top > 0 for r in preds)


def _docs_df(spark):
    # disjoint vocabularies: class 'aa' speaks {foo bar}, 'bb' {baz qux};
    # 'aa' has more train docs so it wins the prior for unseen tokens.
    rows = []
    for did in range(12):
        cls = "aa" if did % 3 != 2 else "bb"
        text = "foo bar foo" if cls == "aa" else "baz qux baz"
        rows.append((did, text, cls))
    # held-out doc 15 speaks only unseen tokens -> prior argmax ('aa')
    rows.append((15, "zzz yyy", "bb"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_classifier_disjoint_vocab_and_prior_fallback(spark):
    from eventstream_fanout_spark.operators.classify import (
        token_weight_classify,
        token_weight_fit,
    )

    docs = _docs_df(spark)
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    weights, priors = token_weight_fit(train, "lang")
    preds = {
        r.doc_id: r
        for r in token_weight_classify(test, weights, priors, "lang").collect()
    }
    assert set(preds) == {0, 5, 10, 15}
    # seen-vocab docs classify by their tokens
    for did in (0, 5, 10):
        assert preds[did].lang_pred == preds[did].lang_true
    # all-unseen doc falls back to the majority prior
    assert preds[15].lang_pred == "aa"


def test_pagerank_sink_outranks_sources_and_mass_bounded(spark):
    from eventstream_fanout_spark.operators.graph import (
        RANK_SCALE,
        pagerank_integer,
    )

    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "source string")
    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "src string, dst string"
    )
    out = {r.source: r for r in pagerank_integer(nodes, edges).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["b"].rank_micro > out["a"].rank_micro
    assert out["b"].in_deg == 2 and out["b"].out_deg == 0
    # quantized floors + dropped dangling mass only ever LOSE rank
    assert sum(r.rank_micro for r in out.values()) <= RANK_SCALE
    assert all(r.rank_micro > 0 for r in out.values())


def test_pagerank_deterministic_across_runs(spark):
    from eventstream_fanout_spark.operators.graph import pagerank_integer

    nodes = spark.createDataFrame(
        [(f"s{i}",) for i in range(6)], "source string"
    )
    edges = spark.createDataFrame(
        [(f"s{i}", f"s{(i * 2 + 1) % 6}") for i in range(6)]
        + [("s0", "s3"), ("s4", "s1")],
        "src string, dst string",
    )
    a = sorted(pagerank_integer(nodes, edges).collect())
    b = sorted(pagerank_integer(nodes, edges).collect())
    assert a == b


def test_key_skew_report_hand_checked(spark):
    from eventstream_fanout_spark.operators.diagnostics import (
        key_skew_report,
    )

    rows = [(1,)] * 6 + [(2,), (3,), (4,)]
    df = spark.createDataFrame(rows, "user_id long")
    out = key_skew_report(df, "user_id", top_k=2).collect()
    assert len(out) == 2
    top = out[0]
    assert (top.user_id, top.cnt) == (1, 6)
    assert (top.n_keys, top.n_rows, top.max_cnt) == (4, 9, 6)
    assert top.pct_micro == 666666  # floor(6e6/9)
    assert top.skew_ratio_micro == 2666666  # floor(6*4*1e6/9)
    # ties on cnt break to the smaller key
    assert out[1].user_id == 2


def test_rollup_cascade_equals_direct_aggregation(spark):
    from eventstream_fanout_spark.operators.diagnostics import (
        QVAL,
        rollup_cascade,
    )

    rows = []
    for d in (1, 2):
        for h in (0, 5):
            for m in (0, 1, 59):
                for k, et in enumerate(("click", "view")):
                    rows.append(
                        (
                            datetime(2024, 3, d, h, m, 30 + k),
                            et,
                            0.1 * (d + h + m + k),
                        )
                    )
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    cascade = sorted(rollup_cascade(ev).collect())
    qv = F.floor(F.col("value") * F.lit(QVAL) + F.lit(0.5)).cast("long")
    direct = sorted(
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(F.date_trunc("minute", "ts")).alias("n_minutes"),
            F.sum(qv).alias("value_micro"),
        )
        .collect()
    )
    assert cascade == direct


def test_rollup_incremental_sim_sandwich_all_true(spark):
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["rollup_incremental_sim"].fn(spark, SF_SMOKE).collect()
    assert rows, "sim produced no day-level rollup rows"
    assert all(r.matches_full for r in rows), (
        "maintained cascade diverged from full recompute"
    )


def test_model_store_serves_latest_complete_generation(spark, tmp_path):
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.classify import (
        token_weight_fit,
    )
    from eventstream_fanout_spark.streaming.model_store import (
        load_token_model,
        save_token_model,
    )

    docs = _docs_df(spark)
    path = str(tmp_path / "model")
    w1, p1 = token_weight_fit(docs.where(F.col("doc_id") < 6), "lang")
    save_token_model(spark, path, w1, p1, 1)
    w2, p2 = token_weight_fit(docs, "lang")
    save_token_model(spark, path, w2, p2, 2)
    w, p = load_token_model(spark, path)
    # generation 2 fit over ALL docs -> its priors differ from gen 1
    assert sorted(p.collect()) == sorted(p2.collect())
    assert sorted(w.collect()) == sorted(w2.collect())
    # a partial generation (weights landed, priors did not) is
    # invisible: latest-complete keys off the priors relation
    (
        w1.withColumn("gen", F.lit(3).cast("int"))
        .write.mode("append")
        .partitionBy("gen")
        .parquet(f"{path}/weights")
    )
    w_after, p_after = load_token_model(spark, path)
    assert sorted(p_after.collect()) == sorted(p2.collect())
    assert sorted(w_after.collect()) == sorted(w2.collect())


def test_scoring_sink_replay_is_byte_identical(spark, tmp_path):
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.classify import (
        token_weight_fit,
    )
    from eventstream_fanout_spark.streaming.model_store import (
        save_token_model,
        streaming_scoring_sink,
    )

    docs = _docs_df(spark)
    mpath, opath = str(tmp_path / "m"), str(tmp_path / "o")
    w, p = token_weight_fit(docs.where(F.col("doc_id") % 5 != 0), "lang")
    save_token_model(spark, mpath, w, p, 1)
    sink = streaming_scoring_sink(mpath, opath)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    sink(batch, 7)
    first = sorted(spark.read.parquet(f"{opath}/preds").collect())
    sink(batch, 7)  # replay: dynamic overwrite of batch_id=7
    second = sorted(spark.read.parquet(f"{opath}/preds").collect())
    assert first == second and first
    # empty batches are a no-op (no partition churn)
    sink(batch.where(F.lit(False)), 8)
    assert sorted(spark.read.parquet(f"{opath}/preds").collect()) == first
    # the replay pin survives a model refresh: refit on ALL docs as
    # generation 2, replay batch 7 -> still scored by generation 1
    w2, p2 = token_weight_fit(docs, "lang")
    save_token_model(spark, mpath, w2, p2, 2)
    sink(batch, 7)
    replayed = sorted(spark.read.parquet(f"{opath}/preds").collect())
    assert replayed == first
    assert all(r.gen == 1 for r in replayed)
    # a NEW batch after the refresh scores with generation 2
    sink(batch, 9)
    gens = {
        r.batch_id: r.gen
        for r in spark.read.parquet(f"{opath}/preds")
        .select("batch_id", "gen")
        .distinct()
        .collect()
    }
    assert gens == {7: 1, 9: 2}


def test_scoring_sink_heals_crash_between_marker_and_preds(spark, tmp_path):
    """Crash window: the marker landed but the predictions did not,
    then a model refresh raced the replay — the replay must score
    with the MARKED generation, not the latest."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.classify import (
        token_weight_fit,
    )
    from eventstream_fanout_spark.streaming.model_store import (
        save_token_model,
        streaming_scoring_sink,
    )

    docs = _docs_df(spark)
    mpath, opath = str(tmp_path / "m"), str(tmp_path / "o")
    w1, p1 = token_weight_fit(docs.where(F.col("doc_id") < 6), "lang")
    save_token_model(spark, mpath, w1, p1, 1)
    # simulate the crash: marker for batch 42 exists, preds do not
    (
        spark.range(1)
        .select(
            F.lit(42).cast("long").alias("batch_id"),
            F.lit(1).cast("int").alias("gen"),
        )
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(f"{opath}/markers")
    )
    # a refresh lands before the replay
    w2, p2 = token_weight_fit(docs, "lang")
    save_token_model(spark, mpath, w2, p2, 2)
    sink = streaming_scoring_sink(mpath, opath)
    sink(docs.where(F.col("doc_id") % 5 == 0), 42)
    rows = spark.read.parquet(f"{opath}/preds").collect()
    assert rows and all(r.gen == 1 for r in rows)
