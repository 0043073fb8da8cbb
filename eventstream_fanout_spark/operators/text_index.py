"""Persisted inverted text index + BM25 keyword search — the retrieval
side of the training-data pipeline as a stored artifact, mirroring the
round-6 ANN index design (operators/ann_index.py).

``inverted_index_postings`` (plans/text_queries.py) builds posting
lists in-plan; this module PERSISTS the index as warehouse tables and
probes the stored form:

* ``postings`` — ``(tok, doc_id, tf)``: one row per (term, doc).
* ``doclens`` — ``(doc_id, dl)``: document length in tokens.
* ``vocab``   — ``(tok, df)``: document frequency per term.
* ``stats``   — 1 row ``(n_docs, total_len)``.

Probe cost model: a keyword query filters ``postings``/``vocab`` on
``tok IN (terms)`` — a pushed-down parquet predicate, so the scan
touches only the matching terms' posting rows (+ a broadcast 1-row
stats side and a doc-length join).  The raw documents table is never
read at query time.

Scoring is the log-free BM25 variant: textbook BM25 idf is
``ln((N - df + 0.5)/(df + 0.5))``, but transcendentals diverge across
engines (the tf-idf lesson, plans/text_queries.py), so the idf RATIO
is used directly — per-term this is the exponential of the standard
idf (a monotone per-term transform; multi-term rankings can differ
from textbook BM25, which is acceptable for a deterministic
hash-checkable scorer and stated here explicitly).  The tf-saturation
factor is the standard ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.
All inputs are exact BIGINTs cast to double; every float op is a
single exactly-rounded IEEE step written with the identical expression
tree in the SQL oracle; the per-doc term sum goes through the
order-independent quantized ``dsum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import dsum
from ..functions.hashing import tokens

BM25_K1 = 1.2
BM25_B = 0.75


FROZEN_BATCH_ID = -1  # the static build's generation


def doc_postings(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a ``(doc_id, text)`` relation — the
    per-document index rows, shared by the static build and the
    streaming ingest sink (one code path, two execution modes)."""
    occ = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = occ.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    return tf.select("tok", "doc_id", "tf"), dl


def build_text_index(
    spark: SparkSession, docs: DataFrame, index_path: str
) -> None:
    """Write the four index tables from a ``(doc_id, text)`` corpus.
    One explode feeds every aggregate (tf, dl, df, stats are all
    partial-agg-friendly counts/sums).

    ``postings``/``doclens`` are written under the frozen generation
    ``batch_id = -1`` so the streaming ingest sink
    (streaming/text_ingest.py) can append later batches replay-safely;
    ``vocab``/``stats`` are SNAPSHOTS of the build-time corpus — valid
    for the static probe (:func:`bm25_topk`), superseded by the
    merge-on-read probe (:func:`bm25_topk_merged`) once batches have
    been ingested."""
    tf, dl = doc_postings(docs)
    for rel, name in ((tf, "postings"), (dl, "doclens")):
        (
            rel.withColumn("batch_id", F.lit(FROZEN_BATCH_ID))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/{name}")
        )
    tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    ).write.mode("overwrite").parquet(f"{index_path}/vocab")
    (
        docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(
            dl.agg(F.sum("dl").cast("bigint").alias("total_len"))
        )
        .write.mode("overwrite")
        .parquet(f"{index_path}/stats")
    )


def bm25_score_expr() -> F.Column:
    """The per-(doc, term) log-free BM25 score.  Expression tree is
    mirrored character-for-character by sql_bm25_score_expr — change
    BOTH or hashes drift in the last ulp."""
    n_docs = F.col("n_docs").cast("double")
    df = F.col("df").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    total_len = F.col("total_len").cast("double")
    idf = ((n_docs - df) + F.lit(0.5)) / (df + F.lit(0.5))
    avgdl = total_len / n_docs
    sat = (tf * F.lit(BM25_K1 + 1.0)) / (
        tf
        + (F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + (F.lit(BM25_B) * (dl / avgdl))))
    )
    return idf * sat


def sql_bm25_score_expr() -> str:
    """DuckDB twin of :func:`bm25_score_expr` (same tree, same literal
    constants, explicit DOUBLE casts so DuckDB's decimal literals
    cannot sneak in)."""
    n_docs = "CAST(s.n_docs AS DOUBLE)"
    df = "CAST(d.df AS DOUBLE)"
    tf = "CAST(t.tf AS DOUBLE)"
    dl = "CAST(l.dl AS DOUBLE)"
    total_len = "CAST(s.total_len AS DOUBLE)"
    idf = f"((({n_docs} - {df}) + CAST(0.5 AS DOUBLE)) / ({df} + CAST(0.5 AS DOUBLE)))"
    avgdl = f"({total_len} / {n_docs})"
    sat = (
        f"(({tf} * CAST({BM25_K1 + 1.0!r} AS DOUBLE)) / "
        f"({tf} + (CAST({BM25_K1!r} AS DOUBLE) * "
        f"(CAST({1.0 - BM25_B!r} AS DOUBLE) + "
        f"(CAST({BM25_B!r} AS DOUBLE) * ({dl} / {avgdl}))))))"
    )
    return f"({idf} * {sat})"


def bm25_topk(
    spark: SparkSession, index_path: str, terms: list[str], k: int
) -> DataFrame:
    """BM25 top-k over the STORED index for a bag of query terms.
    The postings/vocab scans are filtered ``tok IN terms`` (pushed to
    parquet); documents are never read."""
    postings = spark.read.parquet(f"{index_path}/postings").where(
        F.col("tok").isin(terms)
    )
    vocab = spark.read.parquet(f"{index_path}/vocab").where(
        F.col("tok").isin(terms)
    )
    doclens = spark.read.parquet(f"{index_path}/doclens")
    stats = spark.read.parquet(f"{index_path}/stats")
    scored = (
        postings.join(F.broadcast(vocab), "tok")
        .join(doclens, "doc_id")
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


def bm25_topk_merged(
    spark: SparkSession, index_path: str, terms: list[str], k: int
) -> DataFrame:
    """:func:`bm25_topk` with vocab/stats derived MERGE-ON-READ from
    the generational postings/doclens — the probe for an index that
    has ingested batches since its build (the snapshot vocab/stats
    tables are stale then).

    Probe cost: df comes from the SAME term-filtered postings scan the
    scoring uses (pushed ``tok IN`` predicate — only matching rows);
    stats aggregates the doclens table (1 row/doc, the sketch-style
    merge-on-read rollup — compact_text_index keeps it folded)."""
    postings = spark.read.parquet(f"{index_path}/postings").where(
        F.col("tok").isin(terms)
    )
    doclens = spark.read.parquet(f"{index_path}/doclens")
    vocab = postings.groupBy("tok").agg(
        F.count_distinct(F.col("doc_id")).cast("bigint").alias("df")
    )
    # generation-uniqueness contract, enforced on the stats aggregate
    # the probe already pays for: a doc_id present in TWO generations
    # (re-ingested id or a probe racing a crashed compaction) would
    # silently double-count its length in n_docs/total_len AND
    # duplicate its scoring rows through the doclens join — raise
    # instead (the ANN _adc_sum_with_row_guard pattern: the assert
    # rides the total_len expression, +0 when healthy, non-foldable,
    # no extra job; remediation = compact_text_index, which dedupes).
    stats = doclens.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_rows"),
        F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("_len_sum"),
    ).select(
        "n_docs",
        (
            F.col("_len_sum")
            + F.coalesce(
                F.assert_true(
                    F.col("_n_rows") == F.col("n_docs"),
                    F.concat(
                        F.lit("text index probe: "),
                        (F.col("_n_rows") - F.col("n_docs")).cast("string"),
                        F.lit(
                            " doc(s) appear in multiple index "
                            "generations (re-ingested doc_id or crashed "
                            "compaction); re-run compact_text_index "
                            "before probing"
                        ),
                    ),
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            )
        )
        .cast("bigint")
        .alias("total_len"),
    )
    # LEFT join + null-branch assert: a posting row whose doc has no
    # doclens row (the crash window between the sink's postings write
    # and its doclens write) must RAISE, not silently drop the doc from
    # scoring while still counting toward df — replaying the crashed
    # batch heals both stores.  The assert must OWN the null branch of
    # a CASE (not ride a "+" term: binary-arithmetic codegen
    # short-circuits the right operand when the left is null, so an
    # added assert never evaluates exactly when it matters — round-6
    # lesson #2 on lazy guards).
    scored = (
        postings.join(F.broadcast(vocab), "tok")
        .join(doclens.select("doc_id", "dl"), "doc_id", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            F.when(
                F.col("dl").isNull(),
                F.assert_true(
                    F.col("dl").isNotNull(),
                    F.concat(
                        F.lit("text index probe: doc_id "),
                        F.col("doc_id").cast("string"),
                        F.lit(
                            " has postings but no doclens row — the "
                            "ingest sink crashed between its two "
                            "writes; replay the batch (the sink is "
                            "idempotent) before probing"
                        ),
                    ),
                ).cast("double"),
            )
            .otherwise(bm25_score_expr())
            .alias("sc"),
        )
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
