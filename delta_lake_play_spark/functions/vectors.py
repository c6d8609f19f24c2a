"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

All JVM-side higher-order functions (``zip_with`` + ``aggregate``):
no Python UDF in the hot path, so similarity scans stay inside
whole-stage codegen and scale linearly with executors. Elements are
cast to double first so accumulation precision (and oracle parity
with DuckDB's double math) is deterministic: both engines then sum
the same doubles left-to-right over the array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated in double."""
    da, db = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    da = _as_double_array(a)
    return F.sqrt(
        F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns (double precision).

    ``try_divide``: cosine is undefined for a zero-norm vector —
    DuckDB's ``x / 0`` yields NULL while ANSI Spark raises
    DIVIDE_BY_ZERO, so a single all-zero embedding would crash every
    similarity scan. NULL propagates through ``>= threshold`` /
    ranking predicates as "no match" on both engines, which is the
    right semantics for a degenerate vector."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
