"""Multimodal column pattern: media as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` (north-star
surface).

The container has no image/audio libraries, so the actual decode is a
STUB (clearly marked): ``decode_documents`` produces deterministic fake
features derived from the payload bytes, and ``_real_decode`` raises
NotImplementedError behind an import gate.  Everything Spark-side —
schema, binary column handling, Arrow batch shape, partition-parallel
execution — is real and tested.

Scale notes: payloads stay columnar (parquet binary) end-to-end;
mapInPandas streams Arrow batches so executor memory holds one batch,
not one partition, of decoded media.  Feature extraction parallelism ==
input partitions; no shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, status string"
)


def to_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as a multimodal table: opaque binary payload +
    typed metadata struct (the pattern for image/audio/video columns)."""
    payload = F.col(text_col).cast("binary")
    meta = F.struct(
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.lit("text/plain").alias("mime"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def _real_decode(payload: bytes):  # pragma: no cover - stub
    """Real media decode would live here (PIL/librosa/av)."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires an image library not present in this "
            "container; Spark-side plumbing is exercised via the "
            "deterministic fake below"
        ) from exc


def decode_documents(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over the binary payload.
    Returns typed features; swap the fake for ``_real_decode`` when the
    codec libraries exist.

    The batch function is fully self-contained (no references to this
    module) so cloudpickle ships it by value — executors don't need the
    package on their PYTHONPATH.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_decode(payload: bytes) -> tuple[int, int]:
            # Deterministic stand-in for decode: fake dimensions from
            # the payload digest (stable across runs/partitionings).
            d = _hashlib.md5(payload).digest()
            return 64 + d[0] % 64 * 16, 64 + d[1] % 64 * 16

        for pdf in it:
            dims = [fake_decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                    "status": "decoded-fake",
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)
