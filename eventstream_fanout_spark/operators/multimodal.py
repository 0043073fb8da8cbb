"""Multimodal column pattern: media as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` (north-star
surface).

The container has no image/video libraries, so IMAGE decode is a STUB
(clearly marked): ``decode_documents`` produces deterministic fake
features derived from the payload bytes, and ``_real_decode`` raises
NotImplementedError behind an import gate.  AUDIO decode is REAL
(round 4): :func:`synth_wav_table` / :func:`decode_wav` below write
and parse genuine RIFF/WAVE PCM16 files with the stdlib ``wave``
module — hash-checked end-to-end by the ``wav_audio_decode`` query.
Everything Spark-side — schema, binary column handling, Arrow batch
shape, partition-parallel execution — is real and tested for both.

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


# --- real audio decode (round 4): PCM WAV via stdlib ------------------
#
# The image/video codecs stay import-gated (no PIL/av in the
# container), but AUDIO needs nothing beyond the stdlib: the `wave`
# module is a real RIFF/WAVE parser and PCM16 is struct.unpack.  So
# the decode seam gets one genuinely REAL modality: synthesize actual
# WAV files (44-byte canonical header + interleaved PCM16 frames) as a
# binary column, then decode them back with the real parser — both
# sides Arrow-batched mapInPandas, no shuffle, executor memory holds
# one batch of audio, exactly the multimodal contract.  The waveform
# is integer arithmetic on (doc_id, sample index), so a SQL oracle
# regenerates every decoded feature exactly.

WAV_DECODED_SCHEMA = (
    "doc_id long, magic_ok boolean, sample_rate int, channels int, "
    "n_frames long, first_sample int, peak int, sum_sq long"
)


def synth_wav_table(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — a REAL RIFF/WAVE PCM16 file per doc, written
    by the stdlib ``wave`` module.  Deterministic synthesis:
    sample_rate = 8000 + (doc_id%4)*4000, channels = 1 + doc_id%2,
    n_frames = 100 + doc_id%50, flat sample i =
    (doc_id*31 + i*17) % 65536 - 32768."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import struct as _struct
        import wave as _wave

        import pandas as _pd

        def make(doc_id: int) -> bytes:
            rate = 8000 + (doc_id % 4) * 4000
            channels = 1 + doc_id % 2
            n_frames = 100 + doc_id % 50
            n = n_frames * channels
            samples = [
                (doc_id * 31 + i * 17) % 65536 - 32768 for i in range(n)
            ]
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(channels)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(_struct.pack(f"<{n}h", *samples))
            return buf.getvalue()

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [make(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse the RIFF container with the stdlib
    ``wave`` module, unpack PCM16 frames, and emit exact integer
    features (first sample, peak amplitude, energy as a BIGINT sum of
    squares — no float in the output, so the oracle matches
    bit-for-bit)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import struct as _struct
        import wave as _wave

        import pandas as _pd

        def decode(payload: bytes):
            magic_ok = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
            with _wave.open(_io.BytesIO(payload), "rb") as w:
                channels = w.getnchannels()
                rate = w.getframerate()
                n_frames = w.getnframes()
                raw = w.readframes(n_frames)
            n = n_frames * channels
            samples = _struct.unpack(f"<{n}h", raw)
            return (
                magic_ok,
                rate,
                channels,
                n_frames,
                samples[0] if samples else 0,
                max(abs(s) for s in samples) if samples else 0,
                sum(s * s for s in samples),
            )

        for pdf in it:
            rows = [decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "magic_ok": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "n_frames": [r[3] for r in rows],
                    "first_sample": [r[4] for r in rows],
                    "peak": [r[5] for r in rows],
                    "sum_sq": [r[6] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=WAV_DECODED_SCHEMA)
