"""Shared hashed-bigram relation for the n-gram text-quality keys.

Three registry keys (``llm_ngram_novelty``, ``llm_repetition_filter``,
``llm_ngram_lm_score``) reduce to the same core relation: one row per
CONSECUTIVE token pair occurrence, keyed by an int64 bigram hash
instead of the ~40-byte bigram string (VERDICT r10 ask #4 — shuffle
bytes roughly halve and every downstream groupBy/window/join keys on
a fixed-width int64).

Hash design:
- each DISTINCT token is hashed ONCE at vocabulary level with the
  shared mod-prime polynomial (``llm/minhash.py::char_hash`` — the
  interpreted char-fold HOF must stay off the per-occurrence hot
  path: hashing per occurrence measured ~7× SLOWER than the string
  concat it replaced);
- the pair combines INJECTIVELY as ``h1*P + h2`` (each ``h < P``, so
  the product is < P² ≈ 1.0e18 < 2^63) — hashing adds no new
  collision class beyond the token-level char hash itself, distinct
  (h1, h2) pairs never merge;
- the identical computation renders as DuckDB SQL
  (:func:`sql_bigram_hashes_ctes`), so the driver's value-hash
  parity is preserved end to end.

Execution shape: posexplode (narrow) → distinct-token vocabulary →
broadcast join-back by token string → one ``lead`` over
(doc_id, pos) in plain int64 arithmetic. The tokenized relation is
persisted because it feeds both the vocabulary branch and the join
probe (same contract as ``operators/dedup.py::minhash_near_dup_pairs``;
at 100 TB the persist becomes a checkpoint of the token table, and
the vocabulary broadcast is dropped when the vocabulary outgrows an
executor — the join degrades to its shuffle form).

Cache lifetime: the helper returns a lazy DataFrame, so it cannot
pair the persist with an unpersist. That is bounded by design:
Spark's CacheManager dedups by logical plan, so repeated invocations
over the same fixture dir share ONE cached token relation
("already cached" in the logs), i.e. the session footprint is one
entry per distinct input, spilling to disk — and bench.py clears the
cache between keys anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_play_spark.llm import minhash as mh

P = mh.P


def doc_bigram_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """``(doc_id, bigram)`` — one row per consecutive-token-pair
    OCCURRENCE, ``bigram`` the injective int64 pair hash. NULL text
    and sub-2-token documents contribute no rows (mirrored by the SQL
    twin's ``WHERE text IS NOT NULL`` + empty ``generate_series``)."""
    tok = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
        )
        .persist()
    )
    vocab = (
        tok.select("tok")
        .distinct()
        .select("tok", mh.char_hash(F.col("tok")).alias("h"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    th = tok.join(vocab, "tok").select("doc_id", "pos", "h")
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    pair: Column = F.col("h") * F.lit(P) + F.lead("h", 1).over(wseq)
    return th.select("doc_id", pair.alias("bigram")).where(
        F.col("bigram").isNotNull()
    )


def sql_bigram_hashes_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`doc_bigram_hashes`: CTE text defining
    ``bg(doc_id, bigram)`` with identical rows (multiplicity
    included). Embed as ``WITH {sql_bigram_hashes_ctes()}, ...``."""
    hashes = mh.sql_token_hashes(f"string_split({text_col}, ' ')")
    return f"""tok AS (
  SELECT {id_col} AS doc_id, {hashes} AS hs
  FROM {table} WHERE {text_col} IS NOT NULL
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(hs) - 1),
                i -> hs[CAST(i AS INT)] * {P}
                     + hs[CAST(i + 1 AS INT)]))
           AS bigram
  FROM tok
)"""
