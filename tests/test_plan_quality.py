"""Plan-quality regression tests: the physical plans we rely on at
100 TB must not silently degrade — predicate pushdown reaching the
parquet scan, column pruning, broadcast joins for dimensions.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    from eventstream_fanout_spark.plans.registry import QUERIES

    return QUERIES


def test_filter_pushdown_reaches_scan(spark, queries):
    plan = _formatted_plan(queries["filter_pushdown_scan"].fn(spark, SF_ORACLE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or (
        "PushedFilters" in plan and "GreaterThan" in plan
    ), plan
    # projection pruning: the scan must not read all 11 lineitem columns
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_returnflag" not in read and "l_tax" not in read, read


def test_dimension_joins_broadcast(spark, queries):
    for name in ("flagship_enrich", "q3_shipping_priority", "q5_local_supplier_volume"):
        plan = _formatted_plan(queries[name].fn(spark, SF_ORACLE))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"


def test_smj_fallback_when_broadcast_disabled(spark, queries):
    """With broadcasting off, the fact-fact join must degrade to a
    shuffle join (SortMergeJoin/ShuffledHashJoin), never a cartesian —
    the plan shape a 100 TB orders⋈lineitem actually runs."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = load_table(spark, SF_ORACLE, "orders")
        l = load_table(spark, SF_ORACLE, "lineitem")
        j = o.join(l, o.o_orderkey == l.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _formatted_plan(j)
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pair_generators_are_bucketed_not_cartesian(spark, queries):
    """The dedup pair generators must stay bucket-local equi-joins:
    a BroadcastNestedLoopJoin/CartesianProduct here is the n² scale
    killer the banded designs exist to avoid.  (embedding_near_pairs
    is exempt BY DESIGN: it is the ground-truth verifier, explicitly
    capped to a deterministic sample — asserted separately.)"""
    for name in ("simhash_near_pairs", "minhash_lsh_pairs", "ngram_jaccard_dups"):
        plan = _formatted_plan(queries[name].fn(spark, SF_ORACLE))
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} is all-pairs"
        assert "CartesianProduct" not in plan, f"{name} is a cartesian"


def test_embedding_near_pairs_is_sample_capped(spark, queries):
    """The brute-force recall verifier must scan only the explicit
    deterministic sample: the modulo filter has to reach both scans
    BEFORE the pair join."""
    plan = _formatted_plan(queries["embedding_near_pairs"].fn(spark, SF_ORACLE))
    assert plan.count("% 4) = 0") >= 2 or plan.count("% 4 = 0") >= 2, plan


def test_no_python_udfs_on_reference_surface(spark, queries):
    """Reference-surface + relational queries must stay JVM-side
    (BatchEvalPython/ArrowEvalPython would mean a Python UDF crept in)."""
    for name in (
        "flagship_enrich",
        "q1_pricing_summary",
        "window_tumbling_10m",
        "dedup_exact",
        "ann_cosine_topk",
    ):
        plan = _formatted_plan(queries[name].fn(spark, SF_ORACLE))
        assert "EvalPython" not in plan, f"{name} executes Python per-row"


def test_aqe_skew_join_splits_hot_partition(spark):
    """Runtime proof of the skew story the session conf promises: a
    join where 90% of rows share one key must come back from AQE with
    the hot partition SPLIT (SortMergeJoin(skew=true) + AQEShuffleRead
    skewed) — the mechanism that saves hot-key joins at 100 TB without
    manual salting.  Thresholds are scaled down to fire at test size;
    the mechanism is size-independent."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("x").alias("lab")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 270100
        final = (
            j._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin(skew=true)" in final
        assert "skewed" in final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime Bloom-filter join pruning: with a selective dimension
    filter, Catalyst injects bloom_filter_agg/might_contain so the
    fact scan drops non-joining rows BEFORE the shuffle — at 100 TB
    the default size thresholds (10 GB application side) make this
    fire on real facts; here they are scaled down to demonstrate the
    insertion, and row counts are pinned equal with and without it."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "1GB",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        from eventstream_fanout_spark.sources.tables import load_table

        li = load_table(spark, SF_ORACLE, "lineitem")
        orders = load_table(spark, SF_ORACLE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom filter not injected"
        with_bloom = j.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    plain = (
        load_table(spark, SF_ORACLE, "lineitem")
        .join(
            load_table(spark, SF_ORACLE, "orders").where(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert with_bloom == plain


def test_skew_measurement_picks_join_posture(spark):
    """adaptive_bucket_pairs (round-13): the measured max bucket size
    must CHANGE the physical plan — plain equi-join (no salt explode)
    on uniform keys, the lossless salt split (explode visible) on a
    hot key — and both postures must produce the identical pair set."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.diagnostics import (
        adaptive_bucket_pairs,
    )

    uniform = spark.range(100).select(
        (F.col("id") % 50).alias("k"), F.col("id")
    )
    pu, salted_u, mu = adaptive_bucket_pairs(
        uniform, ["k"], "id", hot_cap=10
    )
    assert not salted_u and mu == 2
    plan_u = pu._jdf.queryExecution().executedPlan().toString()
    assert "explode" not in plan_u.lower()

    hot = spark.range(100).select(F.lit(0).alias("k"), F.col("id"))
    ph, salted_h, mh = adaptive_bucket_pairs(hot, ["k"], "id", hot_cap=10)
    assert salted_h and mh == 100
    plan_h = ph._jdf.queryExecution().executedPlan().toString()
    assert "explode" in plan_h.lower(), "salt fan-out missing from plan"

    # losslessness: the salted plan returns every one of the
    # C(100,2) pairs the plain join would
    assert ph.count() == 100 * 99 // 2
