"""Curation-operator invariants the SQL oracle can't see: the oracle
proves Spark==DuckDB, not that the operator does anything useful —
these pin non-degeneracy and reassembly identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_boilerplate_removal_nondegenerate_and_identity(spark):
    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.sources.tables import load_table

    out = QUERIES["boilerplate_block_removal"].fn(spark, SF_ORACLE)
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    joined = out.join(docs, "doc_id").cache()
    try:
        # the threshold actually fires on the injected near-dups
        removed = joined.agg(F.sum("n_removed")).first()[0]
        assert removed and removed > 0, "no boilerplate flagged: degenerate"
        # and doesn't fire everywhere
        untouched = joined.where(F.col("n_removed") == 0)
        assert untouched.count() > 0
        # reassembly identity: docs with nothing removed round-trip
        assert (
            untouched.where(F.col("kept_text") != F.col("text")).count() == 0
        )
        # removal accounting: kept blocks + removed blocks = all blocks
        kept_blocks = F.when(F.col("kept_text") == "", F.lit(0)).otherwise(
            F.ceil(F.size(F.split(F.col("kept_text"), " ")) / 8)
        )
        bad = joined.where(
            kept_blocks + F.col("n_removed") != F.col("n_blocks")
        )
        assert bad.count() == 0
    finally:
        joined.unpersist()


def test_variant_props_fixture_invariant(spark, duck):
    """The variant_props_extract oracle hardcodes vschema =
    'OBJECT<k: BIGINT>' and parse_ok = (event_id % 13 <> 0) — valid
    only while every props cell is exactly {"k": <int>}.  Pin that
    generator invariant so a fixture change fails HERE with a clear
    message instead of as an opaque driver hash diff (ADVICE r3)."""
    bad = duck.execute(
        """
        SELECT COUNT(*) FROM events
        WHERE json_structure(props) NOT IN
              ('{"k":"BIGINT"}', '{"k":"UBIGINT"}')
           OR json_extract(props, '$.k') IS NULL
        """
    ).fetchone()[0]
    assert bad == 0, (
        f"{bad} events rows break the props == {{'k': int}} invariant "
        "the variant_props_extract oracle depends on — update the "
        "hardcoded vschema/parse_ok in scalar_queries.py"
    )


def test_weighted_systematic_sample_quota_and_weighting(spark):
    """The token-weighted systematic sample must draw ~quota total
    copies (exactly the quota when no doc outweighs a stride), give
    heavier docs >= copies of lighter ones in expectation, and never
    select a zero-token doc."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    rows = (
        QUERIES["weighted_systematic_sample"].fn(spark, SF_ORACLE).collect()
    )
    total_copies = sum(r["n_copies"] for r in rows)
    assert total_copies == 100  # boundaries partition the token mass
    assert all(r["n_copies"] >= 1 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_bigram_lift_supports_and_tiebreaks(spark):
    """Collocation mining: every returned bigram meets the support
    floor, lift is finite and positive, and ordering is (lift desc,
    bigram asc)."""
    from eventstream_fanout_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    rows = QUERIES["bigram_lift_top"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    assert all(r["n_ab"] >= 5 and r["lift"] > 0 for r in rows)
    key = [(-r["lift"], r["bigram"]) for r in rows]
    assert key == sorted(key)
