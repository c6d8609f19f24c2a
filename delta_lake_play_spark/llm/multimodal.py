"""Multimodal column handling (SURVEY.md §2.12 ``llm_multimodal_*``).

Pattern for image/audio/video at 100 TB: store the payload as an
opaque ``binary`` column next to typed metadata (modality, declared
dims, byte size), keep all movement columnar (Parquet → Arrow), and
run decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages — per-partition Python, zero shuffle, batch
size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The container has no image/audio codecs, so the actual decode is
stubbed: ``decode_image`` raises ``NotImplementedError`` by default
and the pipeline runs a deterministic fake decoder instead
(byte-level features). Everything Spark-side — schemas, UDF
signatures, batch iteration, 1→N frame explosion — is real and
tested; swapping the fake for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, header_sum bigint, width int, height int"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_checksum bigint"

FRAME_SIZE = 64  # bytes per fake "frame"
FRAME_STRIDE = 4  # sample every 4th frame


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: codec libraries are not available in
    this environment. Swap in ``PIL.Image.open(io.BytesIO(payload))``
    where they are."""
    raise NotImplementedError("image codecs not available in this environment")


def fake_decode_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for decode + feature extraction:
    (n_bytes, sum of first 16 bytes, fake width, fake height)."""
    head = payload[:16]
    n = len(payload)
    return n, sum(head), (n % 640) + 1, (n % 480) + 1


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: binary payload column → decoded feature rows
    (1→1). Operates on whole Arrow batches; per-batch memory is the
    batch's payload bytes, independent of partition size."""
    for pdf in batches:
        feats = [fake_decode_features(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [f[0] for f in feats],
                "header_sum": [f[1] for f in feats],
                "width": [f[2] for f in feats],
                "height": [f[3] for f in feats],
            }
        )


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: treat the payload as a fake "video" of
    FRAME_SIZE-byte frames and emit every FRAME_STRIDE-th frame
    (1→N row explosion — the video-frame-sampling batch shape)."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // FRAME_SIZE)
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(len(frame))
                out["frame_checksum"].append(sum(frame))
        yield pd.DataFrame(out)


RESIZE_SCHEMA = "doc_id bigint, thumb_bytes int, thumb_checksum bigint"

THUMB_SIZE = 256  # bytes in the fake thumbnail


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: "resize" each payload to a fixed-size
    thumbnail (deterministic byte truncation standing in for the
    image scaler — swap for PIL's ``Image.resize`` where codecs
    exist). The batch shape is the real thing: bounded output row
    width regardless of input payload size."""
    for pdf in batches:
        thumbs = [p[:THUMB_SIZE] for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "thumb_bytes": [len(t) for t in thumbs],
                "thumb_checksum": [sum(t) for t in thumbs],
            }
        )
