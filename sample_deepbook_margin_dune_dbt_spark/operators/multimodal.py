"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side design is real and tested — schemas, Arrow-batched Pandas
processing via ``mapInPandas``, partitioning notes — while the actual
codec work is stubbed (image/audio libraries are not in this container):

- ``extract_binary_metadata``  — real: size, md5, magic-byte format sniff,
  computed in pandas batches (the pattern a real decoder plugs into).
- ``decode_image`` / ``sample_frames`` / ``resize_image`` /
  ``extract_audio_features`` — deterministic fakes behind the same
  ``mapInPandas`` plumbing. Each codec step is INJECTABLE: pass
  ``decoder=``/``frame_extractor=``/``resizer=`` to swap in
  PIL/ffmpeg/torchaudio on a cluster with codecs installed — a one-line
  swap at the call site; the Arrow flow, schemas, and partitioning are
  unchanged (`tests/test_operators.py` proves a custom decoder rides the
  same plumbing).

Scale notes: binary payloads ride the shuffle, so partition count must keep
``partition_bytes ≈ rows_per_partition × avg_payload`` under executor
memory — repartition by a key BEFORE attaching payloads when possible, and
set ``spark.sql.files.maxPartitionBytes`` for the scan. ``mapInPandas``
streams Arrow record batches, so peak memory is batch-sized
(``spark.sql.execution.arrow.maxRecordsPerBatch``), not partition-sized.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "id long, size_bytes long, md5_hex string, format string"
)

IMAGE_META_SCHEMA = (
    "id long, size_bytes long, md5_hex string, width int, height int, channels int"
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
]


def _sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def extract_binary_metadata(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Per-payload metadata (size, md5, sniffed format) via mapInPandas.

    Fully real (no stub): this is the template every decode operator
    follows — Arrow batches in, vectorized pandas work, typed rows out.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(len).astype("int64"),
                    "md5_hex": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "format": payloads.map(_sniff_format),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_batches, BINARY_META_SCHEMA)


def fake_image_decode(b: bytes) -> tuple[int, int, int]:
    """Default STUB decoder: deterministic (width, height, channels) from
    the payload md5 — stable across runs/engines. Production:
    ``lambda b: (*PIL.Image.open(io.BytesIO(b)).size, len(Image.open(...).getbands()))``."""
    h = hashlib.md5(b).hexdigest()
    width = 1 + int(h[0:4], 16) % 4096
    height = 1 + int(h[4:8], 16) % 4096
    channels = 1 + int(h[8:10], 16) % 4
    return width, height, channels


def decode_image(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    decoder: Callable[[bytes], tuple[int, int, int]] = fake_image_decode,
) -> DataFrame:
    """Image decode → (id, size, md5, width, height, channels).

    STUB DECODER: the container has no image codecs, so width/height/
    channels are a deterministic fake derived from the payload md5 (stable
    across runs and engines). The Spark-side contract — input binary
    column, Arrow batch flow, output schema — is the real one; replace
    ``_fake_decode`` with ``PIL.Image.open(io.BytesIO(b)).size`` in
    production.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            decoded = payloads.map(decoder)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(len).astype("int64"),
                    "md5_hex": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "channels": decoded.map(lambda t: t[2]).astype("int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_batches, IMAGE_META_SCHEMA)


def fake_frame_extract(b: bytes, every_n_bytes: int, max_frames: int) -> list[str]:
    """Default STUB frame extractor: md5 fingerprints of byte windows at a
    fixed stride. Production: ffmpeg keyframe extraction returning one
    fingerprint (or encoded frame) per keyframe."""
    n = min(max_frames, max(1, len(b) // every_n_bytes))
    return [
        hashlib.md5(b[f * every_n_bytes : (f + 1) * every_n_bytes]).hexdigest()
        for f in range(n)
    ]


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    frame_extractor: Callable[[bytes, int, int], list[str]] = fake_frame_extract,
) -> DataFrame:
    """Video frame sampling → one row per sampled frame.

    STUB: "frames" are md5 fingerprints of byte windows at a fixed stride —
    the real implementation replaces the window fingerprint with an ffmpeg
    keyframe extraction, keeping the same explode-shaped output
    (id, frame_index, frame_md5). Output cardinality is bounded by
    ``max_frames`` so the operator's fan-out is predictable at scale.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, fps = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                for f, fp in enumerate(frame_extractor(b, every_n_bytes, max_frames)):
                    ids.append(i)
                    idxs.append(f)
                    fps.append(fp)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(fps, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        _batches, "id long, frame_index int, frame_md5 string"
    )


def fake_resize(b: bytes, w: int, h: int) -> bytes:
    """Default STUB resizer: stable fingerprint of (payload, target box).
    Production: ``PIL.Image.thumbnail((w, h))`` + re-encode."""
    return hashlib.md5(b + f":{w}x{h}".encode()).digest()


def resize_image(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    target_w: int,
    target_h: int,
    decoder: Callable[[bytes], tuple[int, int, int]] = fake_image_decode,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Image resize → (id, width, height, payload) at the target box,
    preserving aspect ratio (fit-inside, never upscale).

    STUB RESIZER by default: source dims come from ``fake_image_decode``
    and the output payload is a stable fingerprint of (source bytes, fit
    box) — pass ``decoder=``/``resizer=`` to swap in ``PIL.Image.open`` /
    ``Image.thumbnail`` + re-encode. The fit-inside arithmetic, Arrow
    batch flow, and binary-out schema are the real contract; output
    payloads stay bounded by the target box, which is what keeps the
    operator's shuffle volume predictable when resizing billions of images.
    """

    def _fit(w: int, h: int) -> tuple[int, int]:
        scale = min(target_w / w, target_h / h, 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, outs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                w, h = _fit(*decoder(b)[:2])
                ids.append(i)
                ws.append(w)
                hs.append(h)
                outs.append(resizer(b, w, h))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "payload": pd.Series(outs, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        _batches, "id long, width int, height int, payload binary"
    )


def extract_audio_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Audio feature extraction → (id, duration_s, sample_rate, rms).

    STUB: raises NotImplementedError at execution time — audio decoding
    needs codecs absent from this container. The signature and schema are
    the production contract.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires soundfile/torchaudio; not available in this environment"
        )
        yield  # pragma: no cover

    return df.select(id_col, binary_col).mapInPandas(
        _batches, "id long, duration_s double, sample_rate int, rms double"
    )


def attach_text_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Helper: materialize a binary column from text (UTF-8) for testing the
    binary plumbing without real media files."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))
