"""Salted join — the manual skew-mitigation operator.

AQE's skew-join splitting handles most skew at runtime, but it only
splits the *probe* side of a sort-merge join; when one build-side key
dominates (the classic hot-user / hot-null problem), pre-salting is
still the tool. Shape:

1. left rows get a random-but-deterministic salt in ``[0, factor)``
   (hash of a unique column mod factor — reproducible, no RNG);
2. right rows are replicated ``factor`` times, once per salt value
   (``explode(sequence(...))`` — a narrow map, no shuffle);
3. join on ``(key, salt)``: the hot key's rows now spread over
   ``factor`` reducers instead of one.

Cost: right side inflates by ``factor`` — use for skewed joins where
the right side is small-ish but above the broadcast threshold (a
broadcast join needs no salt at all; this fills the gap between
"broadcastable" and "uniform enough for plain shuffle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_cols: str | list[str],
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` with the hot-key rows of
    ``left`` spread over ``factor`` partitions.

    ``salt_cols`` must jointly have high cardinality within a key (a
    row id, or the columns that make the row unique) so the salt
    spreads evenly. Result equals ``left.join(right, key, how)``
    exactly for inner/left joins. Right/full outer joins are refused:
    an unmatched right row exists ``factor`` times after replication
    and would surface ``factor`` times in the output (and salting the
    LEFT side can't help a right-outer join's skew anyway — swap the
    sides and use ``how='left'``)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left join types, not {how!r}: "
            "replicated unmatched right rows would duplicate in the output"
        )
    if isinstance(salt_cols, str):
        salt_cols = [salt_cols]
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(factor))
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")
