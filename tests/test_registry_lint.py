"""Registry-wide lints guarding classes of oracle-parity bugs.

The round-2 driver FAIL (`fn_math`) came from ``round(double, 1)``:
Spark rounds the exact binary value (BigDecimal HALF_UP) while DuckDB
rounds the shortest decimal repr, so any product whose closest double
sits just under an .x5 tie diverges (855.94999999999993 → Spark 855.9,
DuckDB 856.0). The only safe uses of ``round`` in hashed output are
scale-0 grid snaps (value*10^k is mathematically an integer, never
near a tie — see functions/exact.py). These lints reject the unsafe
class at test time so it cannot recur.
"""

import re

from delta_lake_play_spark.registry import all_oracles

# two-arg round with a NONZERO scale: round(<anything>, 1..9) —
# scale 0 (`, 0)`) is the grid-snap idiom and is safe.
_SQL_BAD_ROUND = re.compile(r"\bround\s*\((?:[^()]|\([^()]*\))*,\s*[1-9]\d*\s*\)", re.I)
_PY_BAD_ROUND = re.compile(r"F\.round\((?:[^()]|\([^()]*\))*,\s*[1-9]\d*\s*\)")


def test_no_fractional_round_in_oracles():
    offenders = {k: sql for k, sql in all_oracles().items() if _SQL_BAD_ROUND.search(sql)}
    assert not offenders, (
        f"oracle SQL uses round(x, n>0) on doubles — tie-divergent between "
        f"Spark and DuckDB; use integer-grid arithmetic (functions/exact.py): "
        f"{sorted(offenders)}"
    )


def test_no_fractional_round_in_query_sources():
    import pathlib

    import delta_lake_play_spark.queries as qpkg

    qdir = pathlib.Path(qpkg.__file__).parent
    offenders = []
    for path in sorted(qdir.glob("*.py")):
        src = path.read_text()
        for m in _PY_BAD_ROUND.finditer(src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{path.name}:{line}: {m.group(0)}")
    assert not offenders, (
        "F.round(x, n>0) in query code — tie-divergent vs DuckDB in hashed "
        "columns; snap to an integer grid instead (functions/exact.py):\n"
        + "\n".join(offenders)
    )


def test_priority_window_keys_are_hash_checked():
    """Every key in the driver-window prefix (the first 50 of
    _PRIORITY) must carry an oracle: a rows-only key in a window slot
    burns correctness signal the round cannot get back."""
    from delta_lake_play_spark.registry import _PRIORITY

    oracles = all_oracles()  # loads query modules + validates _PRIORITY
    window = list(dict.fromkeys(_PRIORITY))[:50]
    missing = [k for k in window if k not in oracles]
    assert not missing, f"window keys without oracles: {missing}"


def test_priority_head_has_no_duplicate_slots():
    """Duplicates inside the FIRST-50 prefix would silently shrink the
    effective window (dict.fromkeys collapses them)."""
    from delta_lake_play_spark.registry import _PRIORITY

    head = _PRIORITY[:50]
    assert len(set(head)) == len(head), "duplicate keys in window prefix"
