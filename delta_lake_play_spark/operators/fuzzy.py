"""Blocked fuzzy (edit-distance) joins — the entity-resolution
primitive.

An unblocked fuzzy join is an all-pairs cross product; the standard
scale shape (record linkage literature: "blocking") is (1) assign
each record one or more cheap BLOCK keys that any true match must
share, (2) shuffle on the block key, (3) verify the expensive
predicate (edit distance here) only within blocks. The quadratic
term is bounded by block size, never corpus size — the same
candidate-then-verify architecture as the minhash LSH pipeline
(operators/dedup.py), with the block key playing the band-bucket
role.

Block key here: (string length, last 4 chars). A single-character
SUBSTITUTION anywhere before the tail preserves both, so recall is
exact for that edit class; deletions/insertions shift the tail and
need a second block pass on (length±1, prefix) — the recall/cost
trade every production blocker documents (Papadakis et al., "Blocking
and Filtering Techniques for Entity Resolution", CSUR 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_key(name: str):
    c = F.col(name)
    # Negative-start substring semantics diverge across engines for
    # strings shorter than the window (Spark clamps to the full
    # string, DuckDB's substr(s,-4,4) yields a prefix fragment), so
    # short names block on the full string — a no-op for the >=4-char
    # common case and engine-portable for the rest (ADVICE r6).
    return [
        F.length(c).alias("__blk_len"),
        F.when(F.length(c) >= 4, F.substring(c, -4, 4))
        .otherwise(c)
        .alias("__blk_tail"),
    ]


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    max_dist: int = 1,
) -> DataFrame:
    """Pairs ``(left_id, right_id, lev)`` with
    ``levenshtein(left_name, right_name) <= max_dist``, generated
    through the (length, last-4-chars) blocking join — one keyed
    shuffle; the levenshtein verify runs only on block-collided
    candidates. Self-join callers should filter ``left_id <>
    right_id`` (or an ordering) downstream."""
    lb = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_name).alias("__lname"),
        *_block_key(left_name),
    )
    rb = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_name).alias("__rname"),
        *_block_key(right_name),
    )
    return (
        lb.join(rb, ["__blk_len", "__blk_tail"])
        .withColumn("lev", F.levenshtein("__lname", "__rname"))
        .where(F.col("lev") <= max_dist)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "lev",
        )
    )
