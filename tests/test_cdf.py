"""Change Data Feed: commit-time capture (enable_cdf=True), the
table_changes() reader, protocol ``cdc`` actions in the Delta mirror,
and the readChangeFeed streaming source.

Reference parity: the reference's storage layer (Delta,
``spark_project.py:36``) exposes the same feature as
``delta.enableChangeDataFeed`` + ``table_changes`` +
``readChangeFeed``; this suite pins the semantics commit shape by
commit shape.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from delta_lake_play_spark.table.delta_log import (
    read_delta_changes,
    read_delta_snapshot,
)
from delta_lake_play_spark.table.versioned import (
    VersionedTable,
    temp_table_path,
)


def _mk(spark, n=10, **kwargs):
    df = spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("x"))
    return VersionedTable.create(
        spark, temp_table_path("cdf-test"), df, enable_cdf=True, **kwargs
    )


def _feed(t, start, end=None):
    df = t.table_changes(start, end).drop("_commit_timestamp")
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_update_capture_pre_and_post(spark):
    t = _mk(spark)
    t.update({"x": F.lit(-1)}, "id >= 8")
    assert _feed(t, 1) == sorted(
        [
            (8, 16, "update_preimage", 1),
            (9, 18, "update_preimage", 1),
            (8, -1, "update_postimage", 1),
            (9, -1, "update_postimage", 1),
        ]
    )


def test_update_set_touches_predicate_column(spark):
    # SET zeroes the predicate column itself: the post-image must be
    # the updated row, not an empty re-filter over new values.
    t = _mk(spark, n=4)
    t.update({"x": F.lit(0)}, "x > 4")
    assert _feed(t, 1) == sorted(
        [
            (3, 6, "update_preimage", 1),
            (3, 0, "update_postimage", 1),
        ]
    )


def test_delete_capture_null_predicate_rows_not_in_feed(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -5)], "id long, x long"
    )
    t = VersionedTable.create(
        spark, temp_table_path("cdf-null"), df, enable_cdf=True
    )
    t.delete("x < 0")  # NULL predicate row is kept (SQL semantics)
    assert _feed(t, 1) == [(3, -5, "delete", 1)]
    assert t.read().count() == 2


def test_merge_capture_update_insert_delete_clause(spark):
    src = spark.createDataFrame(
        [(2, 100, False), (3, 0, True), (9, 7, False)],
        "id long, x long, dead boolean",
    )
    t2 = _mk(spark, n=4)  # ids 0..3
    t2.merge(
        src.select("id", "x", F.col("dead")),
        key="id",
        evolve_schema=True,
        delete_matched_where=F.col("dead"),
    )
    feed = _feed(t2, 1)
    # id=2 matched+updated, id=3 matched+delete-claused, id=9 inserted
    assert (2, 4, None, "update_preimage", 1) in feed
    assert (2, 100, False, "update_postimage", 1) in feed
    assert (3, 6, None, "delete", 1) in feed
    assert (9, 7, False, "insert", 1) in feed
    assert len(feed) == 4


def test_delete_mor_capture(spark):
    t = _mk(spark, n=6)
    t.delete_mor("id < 2")
    assert _feed(t, 1) == sorted(
        [(0, 0, "delete", 1), (1, 2, "delete", 1)]
    )
    # re-delete of already-masked rows adds nothing
    t.delete_mor("id < 2")
    assert _feed(t, 2) == []


def test_overwrite_where_capture(spark):
    t = _mk(spark, n=4)
    slice_df = spark.createDataFrame([(2, 77), (3, 88)], "id long, x long")
    t.overwrite_where(slice_df, "id >= 2")
    assert _feed(t, 1) == sorted(
        [
            (2, 4, "delete", 1),
            (3, 6, "delete", 1),
            (2, 77, "insert", 1),
            (3, 88, "insert", 1),
        ]
    )


def test_restore_capture_is_snapshot_diff(spark):
    t = _mk(spark, n=3)
    t.delete("id = 0")          # v1
    t.restore(version=0)        # v2: id=0 comes back
    assert _feed(t, 2) == [(0, 0, "insert", 2)]


def test_append_derives_inserts_without_change_files(spark):
    t = _mk(spark, n=2)
    t.append(spark.createDataFrame([(5, 50)], "id long, x long"))
    assert "cdcFiles" not in t._read_log(1)
    assert _feed(t, 1) == [(5, 50, "insert", 1)]


def test_optimize_contributes_nothing(spark):
    t = _mk(spark, n=8)
    t.append(spark.createDataFrame([(20, 1)], "id long, x long"))
    t.optimize(target_files=1)
    assert _feed(t, 2) == []
    # and full-range feed still replays cleanly over the OPTIMIZE
    assert len(_feed(t, 0)) == 9


def test_non_cdf_table_rewrite_raises_appends_derive(spark):
    df = spark.range(4).select(F.col("id"), (F.col("id") * 2).alias("x"))
    t = VersionedTable.create(spark, temp_table_path("nocdf"), df)
    t.append(spark.createDataFrame([(9, 9)], "id long, x long"))
    assert _feed(t, 1) == [(9, 9, "insert", 1)]
    t.delete("id = 0")
    with pytest.raises(ValueError, match="enable_cdf"):
        t.table_changes(2)


def test_empty_range_schema(spark):
    t = _mk(spark, n=2)
    empty = t.table_changes(0, 0).limit(0)
    assert empty.columns == [
        "id",
        "x",
        "_change_type",
        "_commit_version",
        "_commit_timestamp",
    ]
    with pytest.raises(ValueError, match="bad CDF range"):
        t.table_changes(-1)


def test_mirror_emits_protocol_cdc_actions(spark):
    df = spark.range(9).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 2).alias("x"),
    )
    t = VersionedTable.create(
        spark, temp_table_path("cdf-mirror"), df,
        partition_by=["g"], delta_mirror=True, enable_cdf=True,
    )
    t.update({"x": F.lit(-1)}, "id >= 7")
    t.delete("id = 0")

    ddir = os.path.join(t.path, "_delta_log")
    with open(os.path.join(ddir, f"{0:020d}.json")) as fh:
        actions0 = [json.loads(x) for x in fh if x.strip()]
    proto = next(a["protocol"] for a in actions0 if "protocol" in a)
    assert proto["minWriterVersion"] == 4  # changeDataFeed writer gate
    meta = next(a["metaData"] for a in actions0 if "metaData" in a)
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"

    with open(os.path.join(ddir, f"{1:020d}.json")) as fh:
        actions1 = [json.loads(x) for x in fh if x.strip()]
    cdcs = [a["cdc"] for a in actions1 if "cdc" in a]
    assert cdcs, "UPDATE commit must carry cdc actions"
    for c in cdcs:
        assert c["dataChange"] is False
        assert set(c["partitionValues"]) == {"g"}
        assert c["size"] > 0

    # protocol CDF reader == internal feed, partition cols rebuilt
    # from partitionValues
    a = t.table_changes(0).drop("_commit_timestamp")
    b = read_delta_changes(spark, t.path, 0).drop("_commit_timestamp")
    key = ["_commit_version", "_change_type", "id"]
    pa = a.orderBy(*key).toPandas()
    pb = b.select(*a.columns).orderBy(*key).toPandas()
    assert pa.equals(pb)

    # snapshot readers ignore cdc actions entirely
    snap = read_delta_snapshot(spark, t.path)
    assert snap.count() == t.read().count()


def test_protocol_reader_derives_append_inserts(spark):
    t = VersionedTable.create(
        spark,
        temp_table_path("cdf-mirror2"),
        spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("x")),
        delta_mirror=True,
        enable_cdf=True,
    )
    t.append(spark.createDataFrame([(7, 70)], "id long, x long"))
    b = read_delta_changes(spark, t.path, 1).drop("_commit_timestamp")
    assert [tuple(r) for r in b.collect()] == [(7, 70, "insert", 1)]


def test_non_cdf_mirror_protocol_reader_raises_on_rewrite(spark):
    t = VersionedTable.create(
        spark,
        temp_table_path("nocdf-mirror"),
        spark.range(4).select(F.col("id"), (F.col("id") * 2).alias("x")),
        delta_mirror=True,
    )
    t.delete("id = 0")
    with pytest.raises(ValueError, match="not CDF-readable"):
        read_delta_changes(spark, t.path, 1).collect()


def test_vacuum_reclaims_orphaned_change_files_keeps_referenced(spark):
    t = _mk(spark, n=6)
    t.update({"x": F.lit(0)}, "id = 1")
    cdc_dir = os.path.join(t.path, "_change_data")
    orphan = os.path.join(cdc_dir, "c-99-deadbeef")
    os.makedirs(orphan)
    opath = os.path.join(orphan, "part-0.parquet")
    with open(opath, "wb") as fh:
        fh.write(b"orphan")
    old = time.time() - 7200
    os.utime(opath, (old, old))

    would = t.vacuum(retain_last=10, dry_run=True)
    assert opath in would
    t.vacuum(retain_last=10)
    assert not os.path.exists(opath)
    # the referenced change files survive and the feed still reads
    assert len(_feed(t, 1)) == 2
    # young orphans (possible in-flight commit) are NOT reclaimed
    os.makedirs(orphan, exist_ok=True)
    with open(opath, "wb") as fh:
        fh.write(b"orphan")
    t.vacuum(retain_last=10)
    assert os.path.exists(opath)


def test_streaming_cdf_equals_batch(spark):
    from delta_lake_play_spark.sources.table_stream import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    t = _mk(spark, n=5)
    t.update({"x": F.lit(-1)}, "id >= 3")
    t.delete("id = 0")
    t.append(spark.createDataFrame([(30, 3)], "id long, x long"))
    import uuid

    name = "cdf_t_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("versioned_table")
        .option("readChangeFeed", "true")
        .load(t.path)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table(name).collect())
    exp = sorted(
        tuple(r)
        for r in t.table_changes(0).drop("_commit_timestamp").collect()
    )
    assert got == exp


def test_cdf_commit_conflict_leaves_only_orphans(spark):
    # A losing commit attempt must not leave its change files
    # referenced: simulate by pre-claiming the version the update
    # will target, then retry-succeed and replay the feed.
    t = _mk(spark, n=4)
    t.update({"x": F.lit(1)}, "id = 1")
    t.update({"x": F.lit(2)}, "id = 1")
    # history is linear and each feed row belongs to its own commit
    feed = t.table_changes(1)
    per_v = {
        r["_commit_version"]: r["x"]
        for r in feed.filter("_change_type = 'update_postimage'").collect()
    }
    assert per_v == {1: 1, 2: 2}


def test_restore_of_layout_only_commit_captures_empty_cdf(spark):
    """Hypothesis-found (r6): OPTIMIZE (layout-only) then RESTORE —
    the restore's row diff is EMPTY but files move. The capture must
    be recorded as empty (not absent), table_changes must yield zero
    rows for that version instead of refusing, the CDF stream must
    not fail, and the mirror must mark the restore's file swaps
    dataChange=false so protocol CDF readers skip it."""
    import json as _json
    import os as _os

    from delta_lake_play_spark.table.delta_log import read_delta_changes

    df = spark.range(0, 40).withColumn("v", F.col("id").cast("long"))
    t = VersionedTable.create(
        spark,
        temp_table_path("cdf-restore-empty"),
        df.repartition(3),
        enable_cdf=True,
        delta_mirror=True,
    )
    t.optimize(target_files=1)        # v1: layout-only
    t.restore(0)                      # v2: empty row diff, files move
    entry = t._read_log(2)
    assert "cdcFiles" in entry and entry["cdcFiles"] == []
    assert t.table_changes(2, 2).count() == 0
    assert t.read().count() == 40
    # mirror: v2's add/remove actions are dataChange=false; protocol
    # CDF read over the range yields nothing for v2
    with open(_os.path.join(t.path, "_delta_log", f"{2:020d}.json")) as fh:
        acts = [_json.loads(line) for line in fh if line.strip()]
    moved = [a for a in acts if "add" in a or "remove" in a]
    assert moved and all(
        not (a.get("add") or a.get("remove"))["dataChange"] for a in moved
    )
    ch = read_delta_changes(spark, t.path, 2, 2)
    assert ch.count() == 0
    # a LATER real change still feeds normally
    t.delete(F.col("id") < 5)         # v3
    assert t.table_changes(3, 3).count() == 5
    assert read_delta_changes(spark, t.path, 3, 3).count() == 5
