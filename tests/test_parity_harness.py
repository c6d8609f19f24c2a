"""Regression tests for the parity harness itself.

Round-3 postmortem: ``fn_math`` returned BIGINT where the oracle
returned DOUBLE, every VALUE matched, and the harness hashed the two
frames as EQUAL because ``iterrows()`` upcasts mixed-numeric rows to
float64 before canonicalization. The driver's type-faithful hash
failed the key two rounds running. These tests pin the property that
the harness can never go dtype-blind again.
"""

import numpy as np
import pandas as pd
import pytest

from .parity import canonical_rows, column_type_kinds, compare


def test_int_vs_float_skew_is_caught():
    """Same values, int64 vs float64 — MUST fail (the fn_math bug)."""
    ints = pd.DataFrame({"k": [1, 2, 3], "b": np.array([21, 22, 23], dtype="int64")})
    flts = pd.DataFrame({"k": [1, 2, 3], "b": np.array([21.0, 22.0, 23.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype-kind skew"):
        compare(ints, flts, "skew_demo")


def test_int_vs_float_hashes_differ():
    """canonical_rows must render 21 and 21.0 distinctly so the
    repr-hash (driver_sim) diverges even without compare()'s check."""
    ints = pd.DataFrame({"b": np.array([21], dtype="int64"), "f": [0.5]})
    flts = pd.DataFrame({"b": np.array([21.0], dtype="float64"), "f": [0.5]})
    assert repr(canonical_rows(ints)) != repr(canonical_rows(flts))


def test_mixed_numeric_rows_not_upcast():
    """An int column next to a float column stays int per-cell —
    the exact iterrows() failure shape."""
    pdf = pd.DataFrame({"i": np.array([7], dtype="int64"), "f": [1.5]})
    (row,) = canonical_rows(pdf)
    # columns sorted by name: f, i
    assert isinstance(row[0], float) and type(row[1]) is int


def test_equal_frames_still_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, np.nan], "s": ["x", None]})
    b = pd.DataFrame({"k": [2, 1], "v": [np.nan, 1.5], "s": [None, "x"]})
    compare(a, b, "equal_demo")


def test_nullable_int_upcast_is_symmetric():
    """Both Spark.toPandas and DuckDB.fetchdf upcast nullable ints to
    float64 — the kind check must not false-positive on that."""
    a = pd.DataFrame({"v": [1.0, np.nan]})
    b = pd.DataFrame({"v": [np.nan, 1.0]})
    compare(a, b, "nullable_demo")
    assert column_type_kinds(a)["v"] == {"float"}


def test_bool_is_not_int():
    tru = pd.DataFrame({"v": [True, False]})
    one = pd.DataFrame({"v": [1, 0]})
    with pytest.raises(AssertionError, match="dtype-kind skew"):
        compare(tru, one, "bool_demo")


def test_negative_zero_normalized():
    a = pd.DataFrame({"v": [-0.0]})
    b = pd.DataFrame({"v": [0.0]})
    compare(a, b, "negzero_demo")


def test_complex_cells_are_rejected():
    """Round-5 postmortem (llm_embedding_quantize): the driver's
    canonicalizer crashes on list cells, but the replica's lenient
    list→tuple fallback reported MATCH. The replica must now raise on
    any complex cell, exactly as strict as the driver."""
    lists = pd.DataFrame({"k": [1], "q": [[1.0, 2.0]]})
    with pytest.raises(TypeError, match="complex cell"):
        canonical_rows(lists)
    dicts = pd.DataFrame({"k": [1], "m": [{"a": 1}]})
    with pytest.raises(TypeError, match="complex cell"):
        canonical_rows(dicts)
