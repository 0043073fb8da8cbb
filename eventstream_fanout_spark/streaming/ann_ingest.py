"""Incremental ANN index ingestion — the dedup signature-store pattern
(streaming/corpus_dedup.py) applied to vectors (VERDICT r5 item 5).

A streaming corpus must keep its similarity index current without
refitting: new vectors arrive, get PQ-encoded and IVF-assigned against
the PERSISTED codebook/centroids (frozen artifacts — the quantizer is
fit once, at build time), and their 8-byte code rows append to the
stored ``codes`` table under their micro-batch's own
``batch_id`` partition.  Replay of a batch overwrites only its own
partition (dynamic partition overwrite), so a crash-replay can neither
duplicate nor lose index rows — exactly the corpus-dedup store
contract.  Probes (operators/ann_index.py:pq_probe_topk) see appended
vectors immediately: the codes scan unions all generations.

Steady-state hygiene mirrors the dedup store too: one partition per
micro-batch accumulates listing overhead, so :func:`compact_index`
folds committed batch partitions below the replay watermark into a new
frozen generation with the same two-phase (write-then-delete) crash
contract as corpus_dedup.compact_store.  One semantic difference from
the dedup store: duplicate rows here are NOT harmless (a vec_id
present in two generations doubles its summed ADC distance and sinks
it in the ranking), so the fold dedupes on vec_id, and after a crash
*between* the fold write and the source deletes, compaction must be
RE-RUN before probes resume — the rerun folds the overlap away.
Normal sink operation never duplicates (a replayed batch overwrites
only its own partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann_index import encode_pq_codes


def _read_artifact_or_raise(spark: SparkSession, path: str, what: str):
    """The quantizer artifacts are REQUIRED: ingesting with a missing
    codebook/centroids would silently drop every new vector's codes.
    Fail closed instead (the corpus_dedup fail-closed stance)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        raise RuntimeError(
            f"ANN ingest: the persisted {what} at {path} is missing or "
            "unreadable — build the index (build_pq_index) before "
            "streaming new vectors into it"
        ) from exc


def streaming_ann_index_sink(index_path: str):
    """``foreachBatch`` callback: encode each micro-batch of
    ``(vec_id, embedding)`` rows against the stored quantizer and
    append their index rows idempotently.  Compose with
    ``start_fanout`` or pass to ``writeStream.foreachBatch``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        codebook = _read_artifact_or_raise(
            spark, f"{index_path}/codebook", "PQ codebook"
        )
        centroids = _read_artifact_or_raise(
            spark, f"{index_path}/centroids", "IVF centroids"
        )
        (
            encode_pq_codes(
                batch_df.select("vec_id", "embedding"), codebook, centroids
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "list_id")
            .parquet(f"{index_path}/codes")
        )

    return process


def compact_index(
    spark: SparkSession, index_path: str, upto_batch_id: int
) -> int:
    """Fold the codes table's per-batch partitions below
    ``upto_batch_id`` — plus previous frozen generations — into a new
    frozen generation and drop the sources (two-phase: the fold is
    durably written BEFORE any delete; see corpus_dedup.compact_store
    for the crash/replay analysis this mirrors, including the
    ignoreMissingFiles refusal).  Run only with the ingest stream
    stopped.  Returns the number of source partitions folded."""
    if spark.conf.get("spark.sql.files.ignoreMissingFiles", "false") == "true":
        raise RuntimeError(
            "compact_index refuses to run with "
            "spark.sql.files.ignoreMissingFiles=true: a concurrent probe "
            "racing the post-fold deletes would silently scan a partial "
            "index (see corpus_dedup.compact_store)"
        )
    codes_path = f"{index_path}/codes"
    df = spark.read.parquet(codes_path)
    bids = [r["batch_id"] for r in df.select("batch_id").distinct().collect()]
    fold_ids = [b for b in bids if b < 0 or (0 <= b < int(upto_batch_id))]
    if len(fold_ids) <= 1 and not any(b >= 0 for b in fold_ids):
        return 0  # nothing but (at most) one frozen generation
    next_gen = min([b for b in bids if b < 0], default=0) - 1
    folded = df.where(F.col("batch_id").isin(fold_ids))
    (
        # dropDuplicates: a crash between a previous fold's write and
        # its deletes leaves the same vec_id in two generations, which
        # would double its ADC distance — the rerun folds it away
        folded.select("vec_id", "list_id", "codes")
        .dropDuplicates(["vec_id"])
        .withColumn("batch_id", F.lit(int(next_gen)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "list_id")
        .parquet(codes_path)
    )
    # sources go away only now — the new generation is durably in place
    from py4j.java_gateway import java_import

    jvm = spark._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    fs = jvm.Path(codes_path).getFileSystem(spark._jsc.hadoopConfiguration())
    for bid in fold_ids:
        fs.delete(jvm.Path(f"{codes_path}/batch_id={bid}"), True)
    return len(fold_ids)
