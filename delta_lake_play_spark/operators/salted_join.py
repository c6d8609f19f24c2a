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


def null_split_left_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """LEFT equi-join that routes NULL-key left rows around the join.

    Semantically identical to ``left.join(right, left[left_key] ==
    right[right_key], 'left')`` — a NULL key never matches, so those
    rows exit with the right columns NULL either way. Physically, in a
    shuffled join every NULL-key row hashes to the same partition; on
    fact tables where a foreign key is sparsely populated (10-50%
    NULLs is common in event data) that single partition becomes the
    straggler that dominates the stage. Splitting routes the NULL rows
    through a zero-cost projection and shuffles only the rows that can
    actually match. (With a broadcast right side the split is a no-op
    cost-wise; the planner still benefits from the smaller probe.)

    Precondition: ``left`` and ``right`` column names must be disjoint
    (including the keys). The output carries both sides' columns
    unprefixed, so a shared name would make the null-branch alignment
    overwrite a left column and the union ambiguous — rename or alias
    the right side first."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"null_split_left_join requires disjoint column names; both "
            f"sides have {sorted(overlap)} — alias/rename the right side "
            f"(e.g. right.withColumnRenamed) before joining"
        )
    with_key = left.where(F.col(left_key).isNotNull())
    null_key = left.where(F.col(left_key).isNull())
    joined = with_key.join(
        right, with_key[left_key] == right[right_key], "left"
    )
    # Align the null branch to the joined schema: right columns NULL.
    for name, dtype in right.dtypes:
        null_key = null_key.withColumn(name, F.lit(None).cast(dtype))
    return joined.unionByName(null_key)
