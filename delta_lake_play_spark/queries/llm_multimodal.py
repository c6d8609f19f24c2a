"""Multimodal-column queries (SURVEY.md §2.12 ``llm_multimodal_cols``).

The testdata has no real media, so the binary payload is the UTF-8
encoding of ``documents.text`` — an opaque ``binary`` column as far
as the plan is concerned, which is the point: the judged artifact is
the column typing, metadata plumbing, and mapInPandas batch shapes
(see ``llm/multimodal.py``), not a codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.llm import multimodal as mm
from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- llm_multimodal_cols: typed binary + metadata + embedding join --------

_COLS_ORACLE = """
SELECT d.doc_id,
       d.lang,
       octet_length(encode(d.text)) AS n_bytes,
       len(e.embedding) AS emb_dim,
       e.label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""


@register("llm_multimodal_cols", oracle=_COLS_ORACLE)
def llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A multimodal record: opaque binary payload + typed metadata +
    embedding, one row per document (documents ⋈ embeddings on id).
    Binary stays columnar end-to-end; at 100 TB the payload column
    lives in its own Parquet column chunk, so metadata-only queries
    never read the bytes (column pruning)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    rec = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("embedding"),
        "label",
    )
    return rec.select(
        "doc_id",
        "lang",
        F.length("payload").alias("n_bytes"),
        F.size("embedding").alias("emb_dim"),
        "label",
    )


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


# --- llm_multimodal_decode: Arrow-batched decode/feature-extract ----------
# rows-only: the fake byte-level decode has no DuckDB equivalent.


@register("llm_multimodal_decode")
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the binary column via
    mapInPandas (real codec stubbed — ``llm/multimodal.py``). No
    shuffle: each partition streams Arrow batches through Python
    once; output is narrow typed features."""
    return _payloads(spark, sf_dir).mapInPandas(
        mm.decode_batches, schema=mm.DECODE_SCHEMA
    )


# --- llm_multimodal_framesample: 1→N frame sampling -----------------------


@register("llm_multimodal_framesample")
def llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: every 4th 64-byte block of the
    payload becomes a frame row (1→N mapInPandas explosion). The
    output row count is data-dependent — exactly the shape a real
    ffmpeg sampler produces."""
    return _payloads(spark, sf_dir).mapInPandas(
        mm.frame_sample_batches, schema=mm.FRAME_SCHEMA
    )


# --- llm_multimodal_resize: fixed-size thumbnail stage (rows-only) ---------


@register("llm_multimodal_resize")
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail stage over the binary column via mapInPandas
    (scaler stubbed; see ``llm/multimodal.py``) — output width is
    bounded regardless of payload size, which is what keeps the
    downstream columnar layout predictable."""
    return _payloads(spark, sf_dir).mapInPandas(
        mm.resize_batches, schema=mm.RESIZE_SCHEMA
    )


# --- llm_multimodal_manifest: hash-checked mapInPandas plumbing -----------
#
# The three keys above are rows-only because their checksum columns
# are byte-level. But the frame sampler's SHAPE — how many frames it
# emits per doc, which indices, how many bytes each — is pure
# arithmetic of the payload length (FRAME_SIZE/FRAME_STRIDE in
# llm/multimodal.py), so aggregating the REAL mapInPandas output per
# doc gives a result DuckDB can recompute from octet_length alone.
# This is the driver-hash check for the multimodal batch plumbing:
# if the 1→N explosion mis-indexes, over- or under-samples, or
# mangles a batch boundary, the per-doc sums diverge.

_MANIFEST_ORACLE = """
WITH p AS (
  SELECT doc_id, COALESCE(octet_length(encode(text)), 0) AS n_bytes
  FROM documents
),
s AS (
  SELECT doc_id, n_bytes,
         (GREATEST(1, n_bytes // 64) + 3) // 4 AS sampled
  FROM p
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sampled AS BIGINT) AS n_frames_sampled,
       CAST(2 * sampled * (sampled - 1) AS BIGINT) AS sum_frame_idx,
       CAST(CASE WHEN n_bytes < 64 THEN n_bytes
                 ELSE 64 * sampled END AS BIGINT) AS sum_frame_bytes,
       CAST(n_bytes % 640 + 1 AS INTEGER) AS width,
       CAST(n_bytes % 480 + 1 AS INTEGER) AS height
FROM s
"""


@register("llm_multimodal_manifest", oracle=_MANIFEST_ORACLE)
def llm_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc manifest of the frame-sampling stage: run the real
    Arrow-batched sampler AND decoder, then aggregate counts/index
    sums/byte sums per doc — the mapInPandas plumbing, hash-checked
    against a pure-arithmetic oracle."""
    payloads = _payloads(spark, sf_dir)
    frames = payloads.mapInPandas(
        mm.frame_sample_batches, schema=mm.FRAME_SCHEMA
    )
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames_sampled"),
        F.sum("frame_idx").alias("sum_frame_idx"),
        F.sum("frame_bytes").alias("sum_frame_bytes"),
    )
    decoded = payloads.mapInPandas(
        mm.decode_batches, schema=mm.DECODE_SCHEMA
    ).select("doc_id", "width", "height")
    return per_doc.join(decoded, "doc_id")
