"""Property-style DML sequence tests (SURVEY.md §5.4).

A random sequence of MERGE / DELETE / UPDATE / APPEND / RESTORE is
applied both to a VersionedTable and to a plain-Python model of the
table state. Invariants after every op:

- the latest snapshot equals the model,
- every historical version re-reads exactly as it was when committed
  (time travel is immutable under later writes, ``README.md:9``),
- history length tracks the commit count.

Example counts are small because every commit is a real distributed
write — the value is in the sequence coverage, not the sample size.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from delta_lake_play_spark.table.versioned import VersionedTable, temp_table_path

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("firstname", T.StringType(), False),
        T.StructField("lastname", T.StringType(), False),
    ]
)

# (op_code, seed) pairs; params are derived from the model state so
# every drawn sequence is valid by construction.
_OPS = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 10**6)), min_size=3, max_size=7
)


def _snapshot(table, version=None):
    rows = table.read(version=version).collect() if version is not None else table.to_df().collect()
    return {r.id: (r.firstname, r.lastname) for r in rows}


@pytest.mark.slow
@given(ops=_OPS)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_dml_sequences(spark, ops):
    model = {1: ("James", "Bond"), 2: ("Alice", "Rogers")}
    table = VersionedTable.create(
        spark,
        temp_table_path("prop"),
        spark.createDataFrame([(k, *v) for k, v in model.items()], SCHEMA),
    )
    states = {0: dict(model)}
    next_id = 100

    for op_code, seed in ops:
        ids = sorted(model)
        if op_code == 0:  # MERGE: update one existing (if any) + insert one new
            rows = [(next_id, f"n{seed}", "New")]
            if ids:
                rows.append((ids[seed % len(ids)], f"u{seed}", "Merged"))
            table.merge(
                spark.createDataFrame(rows, SCHEMA), key="id"
            )
            for rid, fn, ln in rows:
                model[rid] = (fn, ln)
            next_id += 1
        elif op_code == 1 and ids:  # DELETE a nonempty id subset
            victims = ids[: (seed % len(ids)) + 1]
            from pyspark.sql import functions as F

            table.delete(F.col("id").isin(victims))
            for v in victims:
                del model[v]
        elif op_code == 2 and ids:  # UPDATE lastname where id == pick
            from pyspark.sql import functions as F

            pick = ids[seed % len(ids)]
            table.update({"lastname": F.lit(f"upd{seed}")}, F.col("id") == pick)
            model[pick] = (model[pick][0], f"upd{seed}")
        elif op_code == 3:  # APPEND a fresh row
            row = (next_id, f"a{seed}", "Appended")
            table.append(spark.createDataFrame([row], SCHEMA))
            model[row[0]] = row[1:]
            next_id += 1
        elif op_code == 4:  # RESTORE to a random earlier version
            v = seed % (table.latest_version() + 1)
            table.restore(v)
            model = dict(states[v])
        elif op_code == 5 and ids:  # merge-on-read DELETE (deletion vector)
            from pyspark.sql import functions as F

            pick = ids[seed % len(ids)]
            table.delete_mor(F.col("id") == pick)
            del model[pick]
        else:  # OPTIMIZE: layout-only commit, content must not move
            table.optimize(target_files=2, cluster_by=["id"])

        version = table.latest_version()
        states[version] = dict(model)
        assert _snapshot(table) == model, f"latest != model after op {op_code}"

    # Time travel: every recorded version still reads as committed.
    for v, expected in states.items():
        assert _snapshot(table, version=v) == expected, f"version {v} mutated"
    assert table.history().count() == table.latest_version() + 1
