"""As-of join — a custom operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row of the
same key with ``right.ts <= left.ts`` (the "last event at or before"
join; cf. the MERGE-style joins the reference exercises at
``api.py:92-102``, but over event time).

Implementation is the union+last_value trick, NOT a per-group
``pd.merge_asof`` and NOT a range self-join:

1. tag right rows side=0, left rows side=1, union by name;
2. single hash shuffle on the key, sort within partition by
   (ts, side, tiebreak);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding
   running window carries the latest right value forward;
4. keep side=1 rows.

At 100 TB this costs exactly one shuffle of left+right (same as any
join on the key), no candidate-pair blow-up, no Python in the loop,
and skewed keys are handled by AQE. Ordering includes a unique
tiebreak column so results are deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_values: list[str],
    tiebreak: str,
) -> DataFrame:
    """Attach latest right_values (right.ts <= left.ts) per key.

    ``left`` and ``right`` must both carry ``on + [ts, tiebreak]``;
    ``right_values`` columns are taken from ``right`` and appear in
    the output prefixed ``asof_``.

    The carried payload is a single STRUCT of all right values, not
    the value columns themselves: a struct from a right row is
    non-null even when every field in it is null, so
    ``last(ignorenulls=True)`` selects the latest right ROW — a
    matched row whose value is genuinely NULL yields NULL, instead
    of leaking an older row's value forward.
    """
    from pyspark.sql import types as T

    carry_type = T.StructType(
        [T.StructField(v, right.schema[v].dataType, True) for v in right_values]
    )
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__carry", F.lit(None).cast(carry_type)
    )
    r_tagged = right.select(
        *on,
        F.col(ts).alias(ts),
        F.col(tiebreak).alias(tiebreak),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(v).alias(v) for v in right_values]).alias("__carry"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__carry", F.last("__carry", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    for v in right_values:
        out = out.withColumn(f"asof_{v}", F.col("__carry")[v])
    return out.drop("__side", "__carry")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_values: list[str],
    tiebreak: str,
) -> DataFrame:
    """Attach the right row NEAREST in time to each left row — the
    smaller of (latest at-or-before, earliest strictly-after), ties
    to the earlier row (sensor-alignment semantics: merge_asof
    direction='nearest').

    Same single shuffle as :func:`asof_join`: both directions are two
    window functions over ONE (key, ts, side, tiebreak) sort — the
    backward carry is ``last(ignorenulls)`` over unbounded-preceding,
    the forward carry ``first(ignorenulls)`` over
    current-row→unbounded-following. Same-timestamp right rows sort
    before the left row, so they land in the backward carry with
    Δ = 0 and win every tie. Output columns: ``nearest_<v>`` per
    right value, ``nearest_<ts>``, and ``nearest_direction``
    ('backward' / 'forward' / NULL when the key has no right row)."""
    from pyspark.sql import types as T

    carry_fields = [*right_values, ts]
    carry_type = T.StructType(
        [
            T.StructField(v, right.schema[v].dataType, True)
            for v in carry_fields
        ]
    )
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__carry", F.lit(None).cast(carry_type)
    )
    r_tagged = right.select(
        *on,
        F.col(ts).alias(ts),
        F.col(tiebreak).alias(tiebreak),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(v).alias(v) for v in carry_fields]).alias("__carry"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(l_tagged.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col(ts).asc(), F.col("__side").asc(), F.col(tiebreak).asc()]
    wb = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        u.withColumn("__back", F.last("__carry", ignorenulls=True).over(wb))
        .withColumn("__fwd", F.first("__carry", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    d_back = F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__back")[ts])
    d_fwd = F.unix_micros(F.col("__fwd")[ts]) - F.unix_micros(F.col(ts))
    pick_back = F.col("__fwd").isNull() | (
        F.col("__back").isNotNull() & (d_back <= d_fwd)
    )
    chosen = F.when(pick_back, F.col("__back")).otherwise(F.col("__fwd"))
    out = u
    for v in right_values:
        out = out.withColumn(f"nearest_{v}", chosen[v])
    out = out.withColumn(f"nearest_{ts}", chosen[ts]).withColumn(
        "nearest_direction",
        F.when(chosen.isNull(), F.lit(None).cast("string"))
        .when(pick_back, F.lit("backward"))
        .otherwise(F.lit("forward")),
    )
    return out.drop("__side", "__carry", "__back", "__fwd")
