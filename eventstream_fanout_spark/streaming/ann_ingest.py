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


def _attr_data_cols(attrs_store: DataFrame) -> list[str]:
    """The attr store's metadata columns (everything but the key and
    the layout columns)."""
    return [
        c
        for c in attrs_store.columns
        if c not in ("vec_id", "batch_id", "list_id")
    ]


def streaming_ann_index_sink(index_path: str):
    """``foreachBatch`` callback: encode each micro-batch of
    ``(vec_id, embedding)`` rows against the stored quantizer and
    append their index rows idempotently.  Compose with
    ``start_fanout`` or pass to ``writeStream.foreachBatch``.

    DELTA-SHAPED attr maintenance (VERDICT r9 item 2): when the index
    carries a filterable-attribute side store
    (operators/ann_index.build_attr_store), the batch's attrs rows
    ride the SAME call — the sink already knows each vector's
    ``list_id`` assignment, so the attrs append lands in the identical
    ``(batch_id, list_id)`` partitions as the codes, and a filtered
    probe stays valid with NO corpus-length ``build_attr_store``
    rebuild.  Fail-closed: an attrs store whose metadata columns the
    batch does not carry raises (silently appending codes without
    attrs would trip every future filtered probe's coverage guard —
    correct but avoidable); batches on an index with NO attrs store
    ignore any extra columns (unfiltered index, current behavior).
    Write order is codes THEN attrs: a crash in between leaves probed
    code rows without attrs, which the probe-time coverage guard
    reports loudly, and replay overwrites both partitions."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from .compaction import read_store_or_none

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        codebook = _read_artifact_or_raise(
            spark, f"{index_path}/codebook", "PQ codebook"
        )
        centroids = _read_artifact_or_raise(
            spark, f"{index_path}/centroids", "IVF centroids"
        )
        attrs_store = read_store_or_none(spark, f"{index_path}/attrs")
        acols: list[str] = []
        if attrs_store is not None:
            acols = _attr_data_cols(attrs_store)
            missing = [c for c in acols if c not in batch_df.columns]
            if missing:
                raise RuntimeError(
                    f"ANN ingest: the index at {index_path} carries a "
                    f"filterable attr store with column(s) {missing} "
                    "the batch does not supply — appending codes "
                    "without their attrs rows would invalidate every "
                    "filtered probe; carry the attr columns on the "
                    "ingest stream (or drop the attrs store)"
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
        if attrs_store is not None:
            # the just-written codes partition IS the batch's
            # (vec_id -> list_id) assignment — a partition-pruned read
            # beats re-running the encode subtree
            assigned = (
                spark.read.parquet(f"{index_path}/codes")
                .where(F.col("batch_id") == int(batch_id))
                .select("vec_id", "list_id")
            )
            (
                assigned.join(
                    batch_df.select("vec_id", *acols), "vec_id"
                )
                .withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "list_id")
                .parquet(f"{index_path}/attrs")
            )

    return process


def delete_vectors(
    spark: SparkSession, index_path: str, vec_ids: list[int]
) -> int:
    """Erase vectors from the stored codes — the ANN twin of
    ``text_ingest.delete_docs`` (right-to-erasure / delete-then-resend
    update path for the append-only index).  Returns the number of
    (generation, list) partitions rewritten.

    Only the (batch_id, list_id) partitions that contain a doomed
    vector are touched (the shared partition-local eraser,
    :func:`..streaming.compaction.erase_rows`): survivors
    dynamic-overwrite their partition, a partition left empty is
    deleted outright.  Idempotent; run with the ingest stream stopped.
    Probes need no post-delete rebuild — ADC scoring carries no corpus
    statistics (the quantizer artifacts are unaffected by
    membership).  An attrs side store, when present, erases the same
    ids alongside (delta-shaped, VERDICT r9 item 2 — attrs rows for
    erased vectors are dead weight the filtered probe's semi-join
    would silently carry, and right-to-erasure covers the metadata
    too)."""
    from .compaction import erase_rows, read_store_or_none

    ids = [int(v) for v in vec_ids]
    n = erase_rows(
        spark,
        f"{index_path}/codes",
        "vec_id",
        ids,
        extra_partition_cols=["list_id"],
    )
    if read_store_or_none(spark, f"{index_path}/attrs") is not None:
        erase_rows(
            spark,
            f"{index_path}/attrs",
            "vec_id",
            ids,
            extra_partition_cols=["list_id"],
        )
    return n


def compact_index(
    spark: SparkSession, index_path: str, upto_batch_id: int
) -> int:
    """Fold the codes table's per-batch partitions below
    ``upto_batch_id`` — plus previous frozen generations — into a new
    frozen generation and drop the sources (the shared two-phase
    contract, :mod:`..streaming.compaction`).  ``dedup_cols=vec_id``
    because code duplicates are NOT harmless here (they double summed
    ADC distances) — after a crash between fold and deletes, RE-RUN
    compaction before probes resume.  Run only with the ingest stream
    stopped.  Returns the number of source partitions folded.

    An attrs side store, when present, folds through the same
    two-phase contract (its generation ids are allocated from its own
    partitions — the two tables need not share fold ids, the filtered
    probe's coverage join is on ``vec_id``)."""
    from .compaction import (
        compact_generations,
        read_store_or_none,
    )

    n = compact_generations(
        spark,
        f"{index_path}/codes",
        upto_batch_id,
        data_cols=["vec_id", "list_id", "codes"],
        dedup_cols=["vec_id"],
        extra_partition_cols=["list_id"],
    )
    attrs_store = read_store_or_none(spark, f"{index_path}/attrs")
    if attrs_store is not None:
        n += compact_generations(
            spark,
            f"{index_path}/attrs",
            upto_batch_id,
            data_cols=["vec_id", "list_id", *_attr_data_cols(attrs_store)],
            dedup_cols=["vec_id"],
            extra_partition_cols=["list_id"],
        )
    return n


def upsert_vectors(
    spark: SparkSession,
    index_path: str,
    new_vectors: DataFrame,
    batch_id: int,
) -> int:
    """UPDATE for the stored codes — re-encode known vectors with new
    embedding values (the ANN face of ``text_ingest.upsert_docs``,
    and a much simpler one: ADC scoring carries no corpus statistics,
    so membership IS the whole state — no corrections, no tombstones;
    the only bookkeeping is the as-of marker below).  Returns the
    number of (generation, list) partitions the erase phase rewrote.

    Three steps, marker FIRST: a ``(batch_id)`` row lands in the
    ``upserts`` marker table (its own partition — replay overwrites it
    in place), then :func:`delete_vectors` on the batch's vec_ids (old
    code rows physically removed from every generation), then the new
    versions encode against the STORED quantizer and append under
    ``batch_id`` through the sink's own per-batch path.  Replaying a
    completed call converges by construction — the delete phase finds
    only the generation-``batch_id`` rows (the previous run's output)
    and the re-append overwrites that same partition set with
    identical content.  Run in a maintenance window (the store-
    rewriting contract); a crash between the phases leaves the batch
    absent from probes until the re-run, which the generation-
    duplicate probe guard cannot detect — membership changes are
    statistics-free by design — so the re-run is the contract.

    The marker exists for AS-OF reproducibility (ADVICE r8 item 2):
    the physical erase rewrites history, so a later
    ``pq_probe_topk(upto_batch_id=N)`` for ``N < batch_id`` would
    return a state that never existed (the vector absent instead of
    present at its old value).  ``pq_probe_topk`` reads the marker
    table and REFUSES as-of probes below the newest upsert generation
    — mirroring ``bm25_topk_asof``'s no-correction guard; erasure
    needs no marker because an erased vector MUST stay absent from
    every as-of view (right-to-erasure beats time travel).  The
    marker is written first so the failure direction is conservative:
    a crash right after it refuses some reproducible probes, never
    serves an unreproducible one."""
    from .compaction import erase_rows, read_store_or_none

    ids = [
        int(r["vec_id"])
        for r in new_vectors.select("vec_id").distinct().collect()
    ]
    (
        spark.createDataFrame(
            [(len(ids), int(batch_id))], "n_ids int, batch_id int"
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{index_path}/upserts")
    )
    rewritten = erase_rows(
        spark,
        f"{index_path}/codes",
        "vec_id",
        ids,
        extra_partition_cols=["list_id"],
    )
    if read_store_or_none(spark, f"{index_path}/attrs") is not None:
        # delta-shaped attrs maintenance (VERDICT r9 item 2): the old
        # attrs rows leave with the old codes; the sink call below
        # re-appends the new versions' attrs (it requires the attr
        # columns on new_vectors — fail-closed) into the re-encoded
        # (batch_id, list_id) partitions, so filtered probes stay
        # valid with no build_attr_store rebuild
        erase_rows(
            spark,
            f"{index_path}/attrs",
            "vec_id",
            ids,
            extra_partition_cols=["list_id"],
        )
    streaming_ann_index_sink(index_path)(new_vectors, int(batch_id))
    return rewritten


def streaming_upsert_sink(index_path: str, batch_id_base: int = 0):
    """``foreachBatch`` callback for a vector UPDATE-QUEUE stream —
    the ANN face of ``text_ingest.streaming_upsert_sink`` (VERDICT r9
    item 4): each micro-batch of ``(vec_id, embedding [, attr cols])``
    rows drives one :func:`upsert_vectors` call under generation
    ``batch_id_base + micro_batch_id``.  Replay converges by
    construction (the delete phase finds only the previous run's
    generation rows; the re-append overwrites the same partitions) and
    the as-of marker lands first, so a crash mid-trigger refuses some
    reproducible as-of probes rather than serving an unreproducible
    one.  Same single-writer contract as the text twin."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_vectors(
            batch_df.sparkSession,
            index_path,
            batch_df,
            int(batch_id_base) + int(batch_id),
        )

    return process
