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

import numpy as np
import pandas as pd


def _np_batch(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch byte view: (bytes, per-row lengths, per-row starts).

    One ``b"".join`` + ``np.frombuffer`` per Arrow batch — every
    per-row feature below is then sliced out of cumulative sums, so
    the Python interpreter never touches individual bytes (the fake
    decoder shouldn't cost codec money).

    NULL payloads (a nullable binary column is the declared contract)
    are treated as zero-byte assets: length 0, empty slice — features
    degrade to 0 instead of crashing the worker."""
    payloads = [b"" if p is None else p for p in payloads]
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    joined = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else lens
    return joined, lens, starts


def _segment_sums(joined: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Sum of ``joined[starts[i]:ends[i]]`` per row, via one int64
    cumulative sum (empty segments sum to 0)."""
    csum = np.concatenate(([0], np.cumsum(joined, dtype=np.int64)))
    return csum[ends] - csum[starts]

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
    (1→1). Operates on whole Arrow batches (numpy-vectorized — the
    interpreter sees one array op per feature, not one call per row);
    per-batch memory is the batch's payload bytes, independent of
    partition size."""
    for pdf in batches:
        joined, lens, starts = _np_batch(pdf["payload"])
        head_sums = _segment_sums(joined, starts, starts + np.minimum(lens, 16))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": lens,
                "header_sum": head_sums,
                "width": (lens % 640 + 1).astype(np.int32),
                "height": (lens % 480 + 1).astype(np.int32),
            }
        )


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: treat the payload as a fake "video" of
    FRAME_SIZE-byte frames and emit every FRAME_STRIDE-th frame
    (1→N row explosion — the video-frame-sampling batch shape)."""
    for pdf in batches:
        joined, lens, starts = _np_batch(pdf["payload"])
        n_frames = np.maximum(1, lens // FRAME_SIZE)
        sampled = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        # flat (doc, frame) index without a Python loop: global row
        # position minus each doc's first row gives the within-doc rank
        first_row = np.cumsum(sampled) - sampled
        within = np.arange(sampled.sum()) - np.repeat(first_row, sampled)
        frame_idx = within * FRAME_STRIDE
        f_starts = np.repeat(starts, sampled) + frame_idx * FRAME_SIZE
        f_ends = np.minimum(f_starts + FRAME_SIZE, np.repeat(starts + lens, sampled))
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].values, sampled),
                "frame_idx": frame_idx.astype(np.int32),
                "frame_bytes": (f_ends - f_starts).astype(np.int32),
                "frame_checksum": _segment_sums(joined, f_starts, f_ends),
            }
        )


RESIZE_SCHEMA = "doc_id bigint, thumb_bytes int, thumb_checksum bigint"

THUMB_SIZE = 256  # bytes in the fake thumbnail


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: "resize" each payload to a fixed-size
    thumbnail (deterministic byte truncation standing in for the
    image scaler — swap for PIL's ``Image.resize`` where codecs
    exist). The batch shape is the real thing: bounded output row
    width regardless of input payload size."""
    for pdf in batches:
        joined, lens, starts = _np_batch(pdf["payload"])
        bounds = np.minimum(lens, THUMB_SIZE)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "thumb_bytes": bounds.astype(np.int32),
                "thumb_checksum": _segment_sums(joined, starts, starts + bounds),
            }
        )
