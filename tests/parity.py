"""Local replica of the driver's t2 check: run a registry query on
Spark and its oracle SQL on DuckDB, then compare row count + schema
shape + order-insensitive values (exact, like a value hash would).

DTYPE-FAITHFUL by design: iteration is column-wise via
``Series.tolist()`` (never ``iterrows()``, which upcasts every
mixed-numeric row to float64 and therefore can NEVER see an
int-vs-float skew — the harness blindness that let fn_math's
BIGINT-vs-DOUBLE ``price_kbucket`` survive two driver rounds), and
row comparison keys on ``repr`` so ``21`` and ``21.0`` — equal under
Python ``==`` — still mismatch, exactly as a type-faithful value hash
would see them.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return None
        return f + 0.0  # normalize -0.0 → 0.0 (equal values, distinct reprs)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
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
    if isinstance(v, np.ndarray) and v.ndim == 0:
        return _canon_cell(v.item())  # 0-d scalar wrapper (e.g. a NULL list cell)
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # The REAL driver canonicalizes with pandas.sort_values over
        # object columns, which raises `TypeError: unhashable type:
        # 'list'` on complex cells (CORRECTNESS_r05 llm_embedding_
        # quantize ERR). A lenient list→tuple fallback here let that
        # key ship locally-green; the replica must be at least as
        # strict as the driver, so complex cells are a hard error.
        # Render arrays/maps to deterministic strings in the query
        # itself (convention: queries/aggregates.py collect_list CSV).
        raise TypeError(
            f"complex cell {type(v).__name__} in hash-checked output — "
            "the driver canonicalizer (pandas sort_values) crashes on "
            "list/dict cells; render to a string column in the query"
        )
    if isinstance(v, bytes):
        return v
    if v != v:  # NaN-like
        return None
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, each cell canonicalized, rows sorted.

    Column-wise iteration preserves per-column dtypes: an int64 cell
    canonicalizes to Python ``int`` and a float64 cell to ``float``,
    so the repr-based hash distinguishes BIGINT from DOUBLE results.
    """
    cols = sorted(pdf.columns)
    if len(pdf) == 0:
        return []
    col_vals = [[_canon_cell(v) for v in pdf[c].tolist()] for c in cols]
    rows = [tuple(cells) for cells in zip(*col_vals)]
    return sorted(rows, key=lambda r: tuple(repr(x) for x in r))


def _type_name(cv) -> str:
    # bool before int: Python bool is an int subclass.
    if isinstance(cv, bool):
        return "bool"
    if isinstance(cv, int):
        return "int"
    if isinstance(cv, float):
        return "float"
    return type(cv).__name__


def column_type_kinds(pdf: pd.DataFrame) -> dict[str, set]:
    """Per column, the set of canonical Python types present (None
    excluded) — the dtype-kind signature compare() checks so an
    int/float skew fails loudly even before the value diff."""
    kinds: dict[str, set] = {}
    for c in pdf.columns:
        ks = set()
        for v in pdf[c].tolist():
            cv = _canon_cell(v)
            if cv is not None:
                ks.add(_type_name(cv))
        kinds[c] = ks
    return kinds


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{key}: column names differ: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    assert len(spark_pdf) > 0, f"{key}: empty result is weak evidence — make the query select rows"
    s_kinds = column_type_kinds(spark_pdf)
    d_kinds = column_type_kinds(duck_pdf)
    kind_skew = {
        c: (s_kinds[c], d_kinds[c])
        for c in s_kinds
        if s_kinds[c] != d_kinds[c]
    }
    assert not kind_skew, (
        f"{key}: column dtype-kind skew (spark vs duck): "
        + "; ".join(f"{c}: {sorted(s)} vs {sorted(d)}" for c, (s, d) in kind_skew.items())
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)

    def _key(row):
        return tuple(repr(x) for x in row)

    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(s_rows, d_rows))
        if _key(a) != _key(b)
    ]
    assert not mismatches, (
        f"{key}: {len(mismatches)}/{len(s_rows)} rows differ; first 3: "
        + "\n".join(f"  row {i}:\n   spark={a}\n   duck ={b}" for i, a, b in mismatches[:3])
    )
