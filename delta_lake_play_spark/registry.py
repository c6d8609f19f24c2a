"""Query registry: the driver-facing inventory of implemented operators.

Each operator from SURVEY.md §2 registers here a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` read straight from this registry.

Oracle-parity conventions (see FIXTURES.md notes):
- every computed column is aliased identically on both sides;
- floating-point aggregates are summed via DECIMAL(38,4|6) casts so
  the result is independent of partition/accumulation order, then
  cast back to DOUBLE on both sides;
- window orderings always include a unique tiebreaker column;
- ``events.ts`` (ns in parquet) is truncated identically on both
  sides before it appears in output or drives bucketing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query callable and its oracle SQL.

    ``oracle=None`` marks a non-SQL-expressible op (time travel,
    approx aggs, hash families): the driver records the weaker
    rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_query_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_query_modules()
    return dict(_ORACLES)


def _load_query_modules() -> None:
    # Import for side effect: each module registers its queries.
    from delta_lake_play_spark import queries  # noqa: F401
