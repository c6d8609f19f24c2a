"""Local replica of the driver's t2 check: run a registry query on
Spark and its oracle SQL on DuckDB, then compare row count + schema
shape + order-insensitive values (exact, like a value hash would)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.datetime64, pd.Timestamp)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            # tz-aware (e.g. DuckDB TIMESTAMPTZ from tz-flagged
            # parquet) vs naive (Spark under a UTC session) are equal
            # INSTANTS — normalize to naive UTC before hashing.
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            from datetime import timezone as _tz

            v = v.astimezone(_tz.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if v != v:  # NaN-like
        return None
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, each cell canonicalized, rows sorted."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows, key=lambda r: tuple(repr(x) for x in r))


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{key}: column names differ: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    assert len(spark_pdf) > 0, f"{key}: empty result is weak evidence — make the query select rows"
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{key}: {len(mismatches)}/{len(s_rows)} rows differ; first 3: "
        + "\n".join(f"  row {i}:\n   spark={a}\n   duck ={b}" for i, a, b in mismatches[:3])
    )
