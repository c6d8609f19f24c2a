"""Parquet source catalog over the driver's synthetic tables.

The reference reads one Delta table from a directory
(``spark_project.py:25-27``); here the source layer is a thin catalog
over the TPC-H-ish parquet tables plus ``events`` / ``documents`` /
``embeddings`` (see TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and vectorized scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins, even at
# 100 TB fact scale (they grow sub-linearly or are fixed-cardinality).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def _nanos_columns(path: str) -> list[str]:
    """TIMESTAMP(NANOS) columns per the parquet footer — the columns
    Spark's reader can only open through ``nanosAsLong`` legacy mode.
    One driver-side footer read per load (no data I/O); any table (not
    just ``events``) may carry ns precision depending on how the
    fixture was generated."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:  # directory-style parquet: sample one part file
        try:
            part = next(
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.endswith(".parquet")
            )
            schema = pq.read_schema(part)
        except (StopIteration, OSError):
            return []
    # startswith: UTC-adjusted ns columns render as
    # "timestamp[ns, tz=UTC]" and are equally illegal for Spark's
    # reader — the workaround must engage for them too.
    return [f.name for f in schema if str(f.type).startswith("timestamp[ns")]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame.

    Timestamp normalization (scan-level, still a plain columnar scan
    with pushdown on every other column):

    - TIMESTAMP(NANOS) parquet columns (``events.ts`` historically;
      any timestamp column depending on fixture generation) are
      rejected outright by Spark's reader (PARQUET_TYPE_ILLEGAL);
      detected from the footer, read via the ``nanosAsLong`` legacy
      mode, and floored to microseconds with exact integer division
      (``div 1000`` on int64 — double division would round by up to
      ±0.25µs at epoch-ns magnitudes). DuckDB's reader floors ns→µs
      the same way.
    - µs-precision parquet timestamps without the UTC flag infer as
      TIMESTAMP_NTZ in Spark 4, which TIMESTAMP-only functions
      (``unix_micros`` et al.) reject. NTZ columns convert to
      TIMESTAMP **per-expression** — ``from_utc_timestamp(cast(c),
      session_tz)`` cancels the session-timezone offset the cast
      applies, so the NTZ wall clock lands on the UTC epoch under any
      FIXED-OFFSET session timezone (it reduces to a plain cast when
      the session is UTC, ``get_spark()``'s pinned default). Honest
      caveat: within an hour of a DST transition the two offsets are
      evaluated at slightly different instants and can differ by the
      DST delta — run sessions at UTC (the engine's default) for
      bit-exact parity. A loader must
      not flip ``spark.sql.session.timeZone`` on a shared session: that
      would silently change the semantics of every subsequent
      timestamp query in sessions not built via ``get_spark()``.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_columns(path)
    if ns_cols:
        # Read-enabling legacy flag, not a semantics flip: without it a
        # TIMESTAMP(NANOS) scan is a hard PARQUET_TYPE_ILLEGAL error,
        # so setting it cannot silently alter another query's results.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        dtypes = dict(raw.dtypes)
        raw = raw.withColumns(
            {
                c: F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                for c in ns_cols
                if dtypes.get(c) == "bigint"
            }
        )
    else:
        raw = spark.read.parquet(path)
    ntz_cols = [c for c, t in raw.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        tz = spark.conf.get("spark.sql.session.timeZone")
        raw = raw.withColumns(
            {
                c: F.from_utc_timestamp(F.col(c).cast("timestamp"), tz)
                for c in ntz_cols
            }
        )
    return raw


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for SQL-form queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
