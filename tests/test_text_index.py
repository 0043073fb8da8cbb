"""Persisted inverted text index + BM25 probe (operators/text_index.py):
the probe must read only the stored index (pushed term filter, no
documents scan) and score sanely."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_fanout_spark.operators.text_index import (
    build_text_index,
    bm25_topk,
)
from eventstream_fanout_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_bm25_probe_reads_only_the_index(spark, tmp_path):
    """Plan shape: the postings scan carries a pushed tok IN filter
    and the documents table is nowhere in the probe plan."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    path = str(tmp_path / "tidx")
    build_text_index(spark, docs, path)
    probe = bm25_topk(spark, path, ["spark", "window", "join"], 10)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan, "probe re-reads the corpus"
    assert "PushedFilters: [In(tok" in plan, plan


def test_bm25_scores_rank_term_rich_docs_first(spark, tmp_path):
    """Semantics: every hit contains >=1 query term; n_terms_matched is
    within [1, 3]; scores strictly ordered (desc, doc_id tiebreak); and
    a doc containing all three terms outranks one with a single rare
    term occurrence of equal length — checked via the returned
    n_terms_matched ordering being consistent with scoring more
    matched terms at similar tf (weak invariant: top hit matches >= 2
    terms on this corpus)."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    path = str(tmp_path / "tidx")
    build_text_index(spark, docs, path)
    rows = bm25_topk(spark, path, ["spark", "window", "join"], 10).collect()
    assert len(rows) == 10
    scores = [r["bm25_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_matched"] <= 3 for r in rows)
    assert all(r["bm25_score"] > 0 for r in rows)

    hit_ids = [r["doc_id"] for r in rows]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(hit_ids)).collect()
    }
    for r in rows:
        toks = set(texts[r["doc_id"]].lower().split())
        matched = {"spark", "window", "join"} & toks
        assert len(matched) == r["n_terms_matched"]


def test_text_ingest_merged_probe_equals_full_build(spark, tmp_path):
    """Ingest path: static build on one half, streaming sink on the
    other — the merge-on-read probe must equal an all-at-once build's
    probe; replay of the same batch id changes nothing; compaction
    folds both stores and preserves the ranking."""
    from eventstream_fanout_spark.operators.text_index import (
        bm25_topk_merged,
    )
    from eventstream_fanout_spark.streaming.text_ingest import (
        compact_text_index,
        streaming_text_index_sink,
    )

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    terms = ["spark", "window", "join"]

    path = str(tmp_path / "tidx_inc")
    build_text_index(spark, docs.where(F.col("doc_id") % 2 == 0), path)
    sink = streaming_text_index_sink(path)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    sink(odd, 1)

    full_path = str(tmp_path / "tidx_full")
    build_text_index(spark, docs, full_path)
    want = [
        (r["doc_id"], r["bm25_score"])
        for r in bm25_topk_merged(spark, full_path, terms, 10).collect()
    ]
    got = [
        (r["doc_id"], r["bm25_score"])
        for r in bm25_topk_merged(spark, path, terms, 10).collect()
    ]
    assert got == want

    # replay batch 1: overwrites itself, ranking unchanged
    sink(odd, 1)
    n_postings = spark.read.parquet(f"{path}/postings").count()
    assert [
        (r["doc_id"], r["bm25_score"])
        for r in bm25_topk_merged(spark, path, terms, 10).collect()
    ] == want

    # compaction folds both stores (frozen + batch 1 each), keeps rows
    assert compact_text_index(spark, path, upto_batch_id=2) == 4
    assert spark.read.parquet(f"{path}/postings").count() == n_postings
    bids = {
        r["batch_id"]
        for r in spark.read.parquet(f"{path}/postings")
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert bids == {-2}
    assert [
        (r["doc_id"], r["bm25_score"])
        for r in bm25_topk_merged(spark, path, terms, 10).collect()
    ] == want


def test_curated_ingest_indexes_only_admitted_docs(spark, tmp_path):
    """The staged fan-out (dedup -> index) as a real checkpointed
    stream: rejected near-dups must never reach the index, replay
    reprocesses nothing, and the index covers exactly the admitted
    set."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from eventstream_fanout_spark.streaming.curated_ingest import (
        curated_ingest_sink,
    )
    from eventstream_fanout_spark.streaming.fanout import (
        FanoutSink,
        start_fanout,
    )

    texts = [
        r["text"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .orderBy("doc_id")
        .limit(4)
        .collect()
    ]
    src = str(tmp_path / "docs_src")
    os.makedirs(src)

    def _write(tag, rows):
        spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in rows]
        ).toPandas().to_json(
            f"{src}/{tag}.jsonl", orient="records", lines=True
        )

    # batch a: two docs + an exact dup; batch b: one new + one dup of
    # an accepted batch-a doc
    _write("a-b0", [(0, texts[0]), (1, texts[1]), (100, texts[0])])
    _write("b-b1", [(10, texts[2]), (11, texts[1])])

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = start_fanout(
            stream,
            [FanoutSink("curate", curated_ingest_sink(store, out, idx))],
            checkpoint_dir=ckpt,
            query_name="curated-ingest",
        )
        q.awaitTermination(300)

    run()
    admitted = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    assert admitted == {0, 1, 10}
    indexed = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/doclens")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert indexed == admitted  # rejected dups never reach the index

    n_postings = spark.read.parquet(f"{idx}/postings").count()
    run()  # checkpointed restart: nothing reprocessed
    assert spark.read.parquet(f"{idx}/postings").count() == n_postings


def test_merged_probe_refuses_duplicated_generation_doc(spark, tmp_path):
    """A doc_id present in two index generations (re-ingested id or a
    probe racing a crashed compaction) would silently double-count its
    length and duplicate its scoring rows — the stats-aggregate guard
    must raise, and compact_text_index (which dedupes) must heal."""
    import pytest

    from eventstream_fanout_spark.operators.text_index import (
        bm25_topk_merged,
    )
    from eventstream_fanout_spark.streaming.text_ingest import (
        compact_text_index,
        streaming_text_index_sink,
    )

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    path = str(tmp_path / "tidx")
    build_text_index(spark, docs, path)
    # operator error: doc 3 re-sent under a new batch id
    sink = streaming_text_index_sink(path)
    sink(docs.where(F.col("doc_id") == 3), 9)

    with pytest.raises(Exception, match="multiple index generations"):
        bm25_topk_merged(spark, path, ["spark", "window"], 10).collect()

    assert compact_text_index(spark, path, upto_batch_id=10) == 4
    rows = bm25_topk_merged(spark, path, ["spark", "window"], 10).collect()
    assert len(rows) == 10


def test_merged_probe_refuses_postings_without_doclens(spark, tmp_path):
    """Crash window between the sink's postings write and its doclens
    write: a doc with postings but no length row must make the probe
    RAISE (it would otherwise silently vanish from scoring while still
    inflating df); replaying the crashed batch heals both stores."""
    import shutil

    import pytest

    from eventstream_fanout_spark.operators.text_index import (
        bm25_topk_merged,
    )
    from eventstream_fanout_spark.streaming.text_ingest import (
        streaming_text_index_sink,
    )

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    path = str(tmp_path / "tidx")
    build_text_index(spark, docs.where(F.col("doc_id") % 2 == 0), path)
    sink = streaming_text_index_sink(path)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    sink(odd, 1)
    # simulate the crash: batch 1's doclens partition vanishes
    shutil.rmtree(f"{path}/doclens/batch_id=1")
    with pytest.raises(Exception, match="no doclens row"):
        bm25_topk_merged(spark, path, ["spark", "window"], 10).collect()

    # replay of the same batch id heals both stores
    sink(odd, 1)
    rows = bm25_topk_merged(spark, path, ["spark", "window"], 10).collect()
    assert len(rows) == 10


def test_bm25_unknown_terms_return_empty(spark, tmp_path):
    """Query terms absent from the corpus match nothing (and do not
    error) — the IN filter simply selects zero postings."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    path = str(tmp_path / "tidx")
    build_text_index(spark, docs, path)
    assert bm25_topk(spark, path, ["zzzznope"], 10).count() == 0
