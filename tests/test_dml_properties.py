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

# The mirror-composition test additionally draws op 7 = minor log
# compaction over a random valid range (metadata-only: no new table
# version, but the protocol reader must keep agreeing with compacted
# files interleaved into the _delta_log).
_OPS_MIRROR = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 10**6)), min_size=3, max_size=7
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


def test_concurrent_writers_linearizable(spark):
    """VERDICT r3 #5: N concurrent writers doing mixed
    append/merge/delete/update against ONE table (each through its
    own table handle, racing on the atomic-link commit). Invariants:
    no writer fails, the history is linearizable (contiguous versions,
    one op per version), no commit is lost (every writer's marker
    rows all land), and replaying the log at each version equals the
    state the committed operation sequence implies for its prefix."""
    import threading

    from pyspark.sql import functions as F

    base = spark.range(0, 20).select(
        F.col("id").cast("long").alias("id"), F.lit(0).cast("long").alias("v")
    )
    t0 = VersionedTable.create(spark, temp_table_path("torture"), base)
    n_writers, ops_each = 6, 3
    errs: list = []

    def worker(wid: int) -> None:
        # own handle — nothing shared but the directory
        t = VersionedTable(spark, t0.path)
        try:
            for i in range(ops_each):
                op = (wid + i) % 4
                if op == 0:  # append a unique marker row
                    t.append(
                        spark.createDataFrame(
                            [(10_000 + wid * 100 + i, wid)], "id long, v long"
                        )
                    )
                elif op == 1:  # merge-upsert a unique marker key
                    t.merge(
                        spark.createDataFrame(
                            [(20_000 + wid * 100 + i, wid)], "id long, v long"
                        ),
                        key="id",
                    )
                elif op == 2:  # update this writer's base row
                    t.update(
                        {"v": F.lit(wid + 1).cast("long")},
                        F.col("id") == wid,
                    )
                else:  # delete a row only this writer touches
                    t.delete(F.col("id") == 14 + wid)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append((wid, e))

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    # linearizable history: contiguous versions, one commit each
    n_commits = 1 + n_writers * ops_each
    assert t0._versions() == set(range(n_commits))
    assert t0.history().count() == n_commits

    final = {r["id"]: r["v"] for r in t0.to_df().collect()}
    # no lost appends/merges: every marker landed exactly once
    for wid in range(n_writers):
        for i in range(ops_each):
            op = (wid + i) % 4
            if op == 0:
                assert final.get(10_000 + wid * 100 + i) == wid, (wid, i)
            elif op == 1:
                assert final.get(20_000 + wid * 100 + i) == wid, (wid, i)
            elif op == 2:
                assert final.get(wid) == wid + 1, wid
            else:
                assert (14 + wid) not in final, wid
    # log-entry row counts agree with a real read at every version
    for v in range(n_commits):
        entry = t0._read_log(v)
        assert t0.read(version=v).count() == entry["num_rows"], v


def test_concurrent_processes_linearizable(tmp_path):
    """Cross-PROCESS writer race: each writer is a separate Python
    process with its own SparkSession (own JVM), all appending to one
    table — the atomic os.link commit and retry loop must hold across
    process boundaries, not just threads."""
    import subprocess
    import sys
    import textwrap

    path = str(tmp_path / "table")
    n_procs, ops_each = 3, 3
    script = textwrap.dedent(
        """
        import sys
        from pyspark.sql import SparkSession, functions as F
        from delta_lake_play_spark.table.versioned import VersionedTable
        wid, path, ops = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
        spark = (SparkSession.builder.master("local[2]")
                 .appName("torture-" + str(wid))
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "1g")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        VersionedTable.create_if_absent(
            spark, path,
            spark.range(0, 5).select(
                F.col("id").cast("long").alias("id"),
                F.lit(-1).cast("long").alias("v")),
        )
        t = VersionedTable(spark, path)
        for i in range(ops):
            t.append(spark.createDataFrame(
                [(1000 + wid * 100 + i, wid)], "id long, v long"))
        print("OK", wid)
        """
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(w), path, str(ops_each)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd="/root/repo",
        )
        for w in range(n_procs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    from delta_lake_play_spark.session import get_spark

    spark = get_spark("delta_lake_play_spark-tests", cpus=8)
    t = VersionedTable(spark, path)
    # create_if_absent races resolve to ONE create; every append landed
    assert t._versions() == set(range(1 + n_procs * ops_each))
    final = {r["id"]: r["v"] for r in t.to_df().collect()}
    for w in range(n_procs):
        for i in range(ops_each):
            assert final.get(1000 + w * 100 + i) == w, (w, i)


@pytest.mark.slow
@given(ops=_OPS_MIRROR)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_dml_cdf_mirror_mapped(spark, ops):
    """The round-5 surfaces COMPOSED: the same random DML sequences,
    but on a table with Change Data Feed capture, a live Delta-log
    mirror, and occasional metadata-only column renames in between.
    Invariants after every op:

    - latest snapshot equals the model (under the CURRENT logical
      schema — renames must not move data),
    - the CDF of each commit REPLAYS: applying its
      delete/update_preimage removals and insert/update_postimage
      additions to the previous version's state yields this
      version's state exactly,
    - the protocol reader (checkpoint + JSON replay over the
      mirrored ``_delta_log``, physicalName-resolved) agrees with
      the private read at the final version and a sampled earlier
      version.
    """
    from pyspark.sql import functions as F

    from delta_lake_play_spark.table.delta_log import read_delta_snapshot

    model = {1: ("James", "Bond"), 2: ("Alice", "Rogers")}
    table = VersionedTable.create(
        spark,
        temp_table_path("propcdf"),
        spark.createDataFrame([(k, *v) for k, v in model.items()], SCHEMA),
        enable_cdf=True,
        delta_mirror=True,
    )
    last_col = "lastname"  # current logical name of the 3rd column

    def snap(version=None):
        df = table.read(version=version) if version is not None else table.to_df()
        return {r[0]: (r[1], r[2]) for r in df.collect()}

    states = {0: dict(model)}
    col_at = {0: last_col}  # logical 3rd-column name per version
    next_id = 100
    renames = 0

    for op_code, seed in ops:
        ids = sorted(model)
        src_schema = T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("firstname", T.StringType(), False),
                T.StructField(last_col, T.StringType(), False),
            ]
        )
        if op_code == 0:  # MERGE: update one existing (if any) + insert one new
            rows = [(next_id, f"n{seed}", "New")]
            if ids:
                rows.append((ids[seed % len(ids)], f"u{seed}", "Merged"))
            table.merge(spark.createDataFrame(rows, src_schema), key="id")
            for rid, fn, ln in rows:
                model[rid] = (fn, ln)
            next_id += 1
        elif op_code == 1 and ids:  # DELETE a nonempty id subset
            victims = ids[: (seed % len(ids)) + 1]
            table.delete(F.col("id").isin(victims))
            for v in victims:
                del model[v]
        elif op_code == 2 and ids:  # UPDATE renamed-lastname where id == pick
            pick = ids[seed % len(ids)]
            table.update({last_col: F.lit(f"upd{seed}")}, F.col("id") == pick)
            model[pick] = (model[pick][0], f"upd{seed}")
        elif op_code == 3:  # APPEND a fresh row
            row = (next_id, f"a{seed}", "Appended")
            table.append(spark.createDataFrame([row], src_schema))
            model[row[0]] = row[1:]
            next_id += 1
        elif op_code == 4:  # RESTORE to a random earlier version
            v = seed % (table.latest_version() + 1)
            table.restore(v)
            model = dict(states[v])
            # RESTORE reverts the logical schema too (Delta
            # semantics — renames are metadata, and metadata is part
            # of the restored state); the model must follow.
            last_col = col_at[v]
        elif op_code == 5 and ids:  # metadata-only RENAME of the 3rd column
            renames += 1
            new_name = f"surname_{renames}"
            table.rename_column(last_col, new_name)
            last_col = new_name
        elif op_code == 6 and ids and seed % 2:  # MoR DELETE (deletion vector)
            pick = ids[seed % len(ids)]
            table.delete_mor(F.col("id") == pick)
            del model[pick]
        elif op_code == 7 and table.latest_version() >= 2:
            # minor LOG COMPACTION over a random valid range —
            # metadata-only: no table version, model unchanged; the
            # end-of-sequence protocol-reader checks must keep
            # agreeing with compacted files interleaved in the log
            from delta_lake_play_spark.table.delta_log import (
                write_log_compaction,
            )

            latest = table.latest_version()
            lo = 1 + seed % latest
            hi = min(latest, lo + 1 + seed % 3)
            if hi > lo:
                write_log_compaction(table, lo, hi)
        else:  # OPTIMIZE: layout-only commit, content must not move
            table.optimize(target_files=2, cluster_by=["id"])

        version = table.latest_version()
        states[version] = dict(model)
        col_at[version] = last_col
        assert snap() == model, f"latest != model after op {op_code}"
        assert table.to_df().columns[2] == last_col, (
            f"3rd column is {table.to_df().columns[2]!r}, model says "
            f"{last_col!r} after op {op_code}"
        )

        # CDF replay of this commit: prev state + feed == new state
        prev = states.get(version - 1)
        if prev is not None:
            feed = table.table_changes(version, version).collect()
            replayed = dict(prev)
            for r in feed:
                if r["_change_type"] in ("delete", "update_preimage"):
                    replayed.pop(r[0], None)
            for r in feed:
                if r["_change_type"] in ("insert", "update_postimage"):
                    replayed[r[0]] = (r[1], r[2])
            assert replayed == model, (
                f"CDF replay diverged at v{version} after op {op_code}"
            )

    # Protocol-reader replay over the mirrored _delta_log.
    def canon(df):
        return {r[0]: (r[1], r[2]) for r in df.collect()}

    assert canon(read_delta_snapshot(spark, table.path)) == model
    mid = table.latest_version() // 2
    assert canon(read_delta_snapshot(spark, table.path, version=mid)) == states[mid]


@pytest.mark.slow
@given(ops=_OPS)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_dml_row_tracking_ict(spark, ops):
    """Random DML over a table with BOTH writer-7 features (row
    tracking + in-commit timestamps) and a live mirror. Invariants
    after every op: snapshot equals the model; the row-id high-water
    mark is monotone and every snapshot's id ranges are disjoint and
    below the mark; each mirrored commit leads with a strictly
    increasing inCommitTimestamp, and resolving that timestamp
    through the protocol reader returns exactly that version; the
    protocol replay agrees with the private read at the end."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from delta_lake_play_spark.table.delta_log import (
        read_delta_snapshot,
        resolve_delta_timestamp,
    )

    model = {1: ("James", "Bond"), 2: ("Alice", "Rogers")}
    table = VersionedTable.create(
        spark,
        temp_table_path("proprt"),
        spark.createDataFrame([(k, *v) for k, v in model.items()], SCHEMA),
        delta_mirror=True,
        row_tracking=True,
        in_commit_timestamps=True,
    )
    states = {0: dict(model)}
    next_id = 100
    prev_hwm = -1

    for op_code, seed in ops:
        ids = sorted(model)
        if op_code in (0, 5):  # MERGE (5 reuses merge; MoR refused here)
            rows = [(next_id, f"n{seed}", "New")]
            if ids:
                rows.append((ids[seed % len(ids)], f"u{seed}", "Merged"))
            table.merge(spark.createDataFrame(rows, SCHEMA), key="id")
            for rid, fn, ln in rows:
                model[rid] = (fn, ln)
            next_id += 1
        elif op_code == 1 and ids:
            victims = ids[: (seed % len(ids)) + 1]
            table.delete(F.col("id").isin(victims))
            for v in victims:
                del model[v]
        elif op_code == 2 and ids:
            pick = ids[seed % len(ids)]
            table.update({"lastname": F.lit(f"upd{seed}")}, F.col("id") == pick)
            model[pick] = (model[pick][0], f"upd{seed}")
        elif op_code == 3:
            row = (next_id, f"a{seed}", "Appended")
            table.append(spark.createDataFrame([row], SCHEMA))
            model[row[0]] = row[1:]
            next_id += 1
        elif op_code == 4:
            v = seed % (table.latest_version() + 1)
            table.restore(v)
            model = dict(states[v])
        else:
            table.optimize(target_files=2, cluster_by=["id"])

        version = table.latest_version()
        states[version] = dict(model)
        assert _snapshot(table) == model, f"latest != model after op {op_code}"
        hwm = table.row_id_high_water_mark(version)
        assert hwm >= prev_hwm, f"hwm regressed at v{version}"
        prev_hwm = hwm
        spans = sorted(
            (f["baseRowId"], f["baseRowId"] + f["num_rows"])
            for f in table._read_log(version)["files"]
            if f["num_rows"] > 0
        )
        for i in range(len(spans) - 1):
            assert spans[i][1] <= spans[i + 1][0], f"overlap at v{version}"
        assert all(hi - 1 <= hwm for _, hi in spans)

    ddir = _os.path.join(table.path, "_delta_log")
    prev_ict = -1
    for v in sorted(table._versions()):
        with open(_os.path.join(ddir, f"{v:020d}.json")) as fh:
            ict = _json.loads(fh.readline())["commitInfo"]["inCommitTimestamp"]
        assert ict > prev_ict, f"ICT not increasing at v{v}"
        prev_ict = ict
        assert resolve_delta_timestamp(table.path, ict) == v

    replay = {
        r[0]: (r[1], r[2])
        for r in read_delta_snapshot(spark, table.path).collect()
    }
    assert replay == model


def test_join_mv_keyed_refresh_converges_over_rounds(spark):
    """The change-feed-keyed MV refresh (dml_incremental_join_mv's
    pattern) converges to the full join after EVERY round, with the
    per-round change feed read from the last-refreshed watermark."""
    from pyspark.sql import functions as F

    from delta_lake_play_spark.table.versioned import (
        VersionedTable,
        temp_table_path,
    )

    ord_rows = [(i, i % 4, float(i)) for i in range(12)]
    cust_rows = [(k, f"cust-{k}") for k in range(4)]
    ord_t = VersionedTable.create(
        spark,
        temp_table_path("mvp-ord"),
        spark.createDataFrame(ord_rows, "o_id long, cust long, amt double"),
    )
    cust_t = VersionedTable.create(
        spark,
        temp_table_path("mvp-cust"),
        spark.createDataFrame(cust_rows, "cust long, name string"),
    )

    def full_join():
        return ord_t.to_df().join(cust_t.to_df(), "cust").select(
            "cust", "o_id", "amt", "name"
        )

    mv = VersionedTable.create(spark, temp_table_path("mvp-mv"), full_join())
    marks = {"ord": ord_t.latest_version(), "cust": cust_t.latest_version()}

    def refresh():
        keys = (
            ord_t.changes(marks["ord"])
            .select("cust")
            .unionByName(cust_t.changes(marks["cust"]).select("cust"))
            .distinct()
        )
        sliced = (
            ord_t.to_df().join(F.broadcast(keys), "cust", "leftsemi")
            .join(
                cust_t.to_df().join(F.broadcast(keys), "cust", "leftsemi"),
                "cust",
            )
            .select("cust", "o_id", "amt", "name")
        )
        mv.overwrite_for_keys(sliced, "cust", keys_df=keys)
        marks.update(ord=ord_t.latest_version(), cust=cust_t.latest_version())

    def assert_converged():
        got = {tuple(r) for r in mv.to_df().collect()}
        want = {tuple(r) for r in full_join().collect()}
        assert got == want

    # round 1: fact-side append + delete
    ord_t.append(
        spark.createDataFrame([(100, 1, 9.5), (101, 9, 1.0)],
                              "o_id long, cust long, amt double")
    )
    ord_t.delete(F.col("cust") == 2)
    refresh()
    assert_converged()

    # round 2: dim-side update + a new dim key matching round-1 orphan
    cust_t.update({"name": F.concat("name", F.lit("!"))}, F.col("cust") == 1)
    cust_t.append(spark.createDataFrame([(9, "late-cust")], "cust long, name string"))
    refresh()
    assert_converged()


# Ops 0-3 are DML (merge/delete/update/append), op 4 = checkpoint the
# mirror, op 5 = checkpoint + metadata cleanup (retention 0 at a
# future "now", so everything below the checkpoint goes away).
_OPS_CLEANUP = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 10**6)), min_size=4, max_size=8
)


@pytest.mark.slow
@given(ops=_OPS_CLEANUP)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_dml_with_log_cleanup(spark, ops):
    """Random DML interleaved with mirror checkpoints and metadata
    cleanup (delta.logRetentionDuration at retention 0). Invariants
    after every op: the protocol reader's LATEST read equals the
    model, and after each cleanup every version at or above the
    newest checkpoint still reconstructs to its historical state
    (the replay horizon contract) — all while checkpoints seed txn/
    tombstone state from their predecessors across the deleted
    prefix."""
    import os as _os

    from pyspark.sql import functions as F

    from delta_lake_play_spark.table.delta_log import read_delta_snapshot

    model = {1: ("James", "Bond"), 2: ("Alice", "Rogers")}
    table = VersionedTable.create(
        spark,
        temp_table_path("propgc"),
        spark.createDataFrame([(k, *v) for k, v in model.items()], SCHEMA),
        delta_mirror=True,
    )
    states = {0: dict(model)}
    next_id = 100
    last_cp = None

    def canon(df):
        return {r[0]: (r[1], r[2]) for r in df.collect()}

    for op_code, seed in ops:
        ids = sorted(model)
        if op_code == 0:  # MERGE
            rows = [(next_id, f"n{seed}", "New")]
            if ids:
                rows.append((ids[seed % len(ids)], f"u{seed}", "Merged"))
            table.merge(spark.createDataFrame(rows, SCHEMA), key="id")
            for rid, fn, ln in rows:
                model[rid] = (fn, ln)
            next_id += 1
        elif op_code == 1 and ids:  # DELETE
            victims = ids[: (seed % len(ids)) + 1]
            table.delete(F.col("id").isin(victims))
            for v in victims:
                del model[v]
        elif op_code == 2 and ids:  # UPDATE
            pick = ids[seed % len(ids)]
            table.update({"lastname": F.lit(f"upd{seed}")}, F.col("id") == pick)
            model[pick] = (model[pick][0], f"upd{seed}")
        elif op_code == 3:  # APPEND (txn-tagged so cleanup must keep it)
            row = (next_id, f"a{seed}", "Appended")
            table.append(
                spark.createDataFrame([row], SCHEMA),
                txn_app_id="prop-loader",
                txn_version=next_id,
            )
            model[row[0]] = row[1:]
            next_id += 1
        elif op_code == 4:  # checkpoint only
            last_cp = table.checkpoint_mirror()
        else:  # checkpoint + cleanup at retention 0
            last_cp = table.checkpoint_mirror()
            future = int(_os.path.getmtime(table.path) * 1000) + 10_000_000
            table.cleanup_log_mirror(retention_ms=0, now_ms=future)

        states[table.latest_version()] = dict(model)
        assert canon(read_delta_snapshot(spark, table.path)) == model, (
            f"protocol latest diverged after op {op_code}"
        )

    if last_cp is not None:
        # every version from the newest checkpoint up must replay
        for v in range(last_cp, table.latest_version() + 1):
            if v in states:
                assert canon(
                    read_delta_snapshot(spark, table.path, version=v)
                ) == states[v], f"version {v} lost after cleanup"
