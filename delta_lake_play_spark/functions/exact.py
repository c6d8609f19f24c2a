"""Order-independent floating-point aggregation helpers.

Double summation is accumulation-order-dependent, and Spark's
partition order differs from DuckDB's scan order — so a plain
``SUM(double)`` can hash-mismatch the oracle. The testdata's double
columns all sit on small decimal grids (≤2 fractional decimals,
verified per column; products of two/three 2-dp values sit on 4/6-dp
grids). A grid value times 10^grid is mathematically an integer, and
its double representation lies within ~1e-9 of that integer — never
near a rounding midpoint — so both engines round it to the SAME
int64. Summing int64 is exact and order-independent; dividing the
exact sum back by 10^grid is a single deterministic IEEE op.

This beats a double→DECIMAL cast, which rounds at the grid boundary
itself (where the two engines' double→decimal conversions can
legitimately disagree — observed on sum_disc_price).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, grid: int = 2) -> Column:
    """Exact, order-independent sum of a grid-decimal double column."""
    scale = 10**grid
    return F.sum(F.round(_col(col) * scale, 0).cast("bigint")) / F.lit(float(scale))


def davg(col: Column | str, grid: int = 2) -> Column:
    """Order-independent mean of a grid-decimal double column."""
    return dsum(col, grid) / F.count(_col(col))


def sql_dsum(expr: str, grid: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    scale = 10**grid
    # CAST the quotient to DOUBLE explicitly: Spark SQL parses the bare
    # literal ``100.0`` as DECIMAL(4,1) and types BIGINT/DECIMAL as
    # DECIMAL, while DuckDB's ``100.0`` is DOUBLE — without the cast the
    # two engines return different result types for the same values
    # (the round-1 agg_grouping_sets hash FAIL).
    return f"CAST(SUM(CAST(round(({expr}) * {scale}) AS BIGINT)) / {float(scale)} AS DOUBLE)"


def sql_davg(expr: str, grid: int = 2) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"({sql_dsum(expr, grid)} / COUNT({expr}))"
