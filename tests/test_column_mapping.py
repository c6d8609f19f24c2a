"""Column mapping: metadata-only RENAME/DROP COLUMN (Delta
``delta.columnMapping.mode = 'name'`` semantics — stable physical
parquet names under a movable logical schema), across DML, time
travel, CDF, data skipping, clones, streaming, and the open mirror.
"""

import json
import os

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


def _mk(spark, n=6, **kwargs):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 2).alias("x"),
        F.lit("k").alias("tag"),
    )
    return VersionedTable.create(
        spark, temp_table_path("colmap"), df, **kwargs
    )


def test_rename_is_metadata_only_and_reads_through(spark):
    t = _mk(spark)
    before = [f["path"] for f in t._read_log(0)["files"]]
    t.rename_column("x", "value")
    after = [f["path"] for f in t._read_log(1)["files"]]
    assert before == after  # zero data files written
    assert t.read().columns == ["id", "value", "tag"]
    assert t.read().filter("id = 2").collect()[0]["value"] == 4


def test_dml_after_rename(spark):
    t = _mk(spark)
    t.rename_column("x", "value")
    t.update({"value": F.col("value") + 100}, "id >= 4")
    t.delete("value = 0")
    src = spark.createDataFrame(
        [(1, 777, "m"), (50, 1, "new")], "id long, value long, tag string"
    )
    t.merge(src, "id")
    rows = {r["id"]: r for r in t.read().collect()}
    assert 0 not in rows
    assert rows[1]["value"] == 777
    assert rows[4]["value"] == 108 and rows[5]["value"] == 110
    assert rows[50]["tag"] == "new"


def test_time_travel_shows_old_names(spark):
    t = _mk(spark)
    t.rename_column("x", "value")
    old = t.read(version=0)
    assert old.columns == ["id", "x", "tag"]
    assert old.filter("id = 3").collect()[0]["x"] == 6


def test_drop_then_readd_gets_fresh_physical(spark):
    t = _mk(spark)
    t.drop_column("tag")
    assert t.read().columns == ["id", "x"]
    src = spark.createDataFrame([(0, 0, "NEW")], "id long, x long, tag string")
    t.merge(src, "id", evolve_schema=True)
    rows = {r["id"]: r for r in t.read().collect()}
    # id=0 carries the merged value; every other row must read NULL,
    # never the dropped generation's stale 'k' bytes
    assert rows[0]["tag"] == "NEW"
    assert all(rows[i]["tag"] is None for i in rows if i != 0)
    cmap = t._read_log(t.latest_version())["columnMap"]
    assert cmap["tag"] != "tag"  # fresh physical name


def test_stats_rekeyed_for_skipping(spark):
    t = _mk(spark, n=100)
    t.optimize(target_files=4, cluster_by=["x"])
    t.rename_column("x", "value")
    files = t._read_log(t.latest_version())["files"]
    assert all("value" in f["stats"] and "x" not in f["stats"] for f in files)
    # pruned range read under the new name stays correct
    assert t.read_range("value", 180, None).count() == 10


def test_guards(spark):
    df = spark.range(4).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("part"),
        (F.col("id") * 3).alias("v"),
        (F.col("id") + 1).alias("w"),
    )
    t = VersionedTable.create(
        spark,
        temp_table_path("colmap-guard"),
        df,
        partition_by=["part"],
        constraints={"w_ok": "w >= 0"},
        generated={"vv": "v * 2"},
        bloom_filter_cols=["id"],
    )
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("part", "p2")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("w")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("vv", "v3")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("v")
    with pytest.raises(ValueError, match="bloom"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("zzz", "a")
    t2 = _mk(spark)
    with pytest.raises(ValueError, match="already exists"):
        t2.rename_column("x", "tag")
    with pytest.raises(ValueError, match="only column"):
        t3 = VersionedTable.create(
            spark, temp_table_path("colmap-one"), spark.range(2)
        )
        t3.drop_column("id")


def test_cdf_across_rename_uses_end_schema(spark):
    t = _mk(spark, enable_cdf=True)
    t.update({"x": F.lit(-1)}, "id = 0")     # v1, pre-rename capture
    t.rename_column("x", "value")            # v2, metadata-only
    t.update({"value": F.lit(-2)}, "id = 1")  # v3
    ch = t.table_changes(0).drop("_commit_timestamp")
    assert ch.columns == ["id", "value", "tag", "_change_type", "_commit_version"]
    rows = sorted(tuple(r) for r in ch.collect())
    # pre-rename capture files surface under the END name with values
    assert (0, 0, "k", "update_preimage", 1) in rows
    assert (0, -1, "k", "update_postimage", 1) in rows
    assert (1, -2, "k", "update_postimage", 3) in rows
    # the metadata-only rename contributes no rows
    assert not [r for r in rows if r[4] == 2]


def test_changes_across_rename_is_empty(spark):
    t = _mk(spark)
    t.rename_column("x", "value")
    assert t.changes(0, 1).count() == 0


def test_clone_inherits_map(spark):
    t = _mk(spark)
    t.rename_column("x", "value")
    t.drop_column("tag")
    c = t.clone_to(temp_table_path("colmap-clone"))
    assert c.read().columns == ["id", "value"]
    assert c.read().filter("id = 2").collect()[0]["value"] == 4
    c.update({"value": F.lit(0)}, "id = 2")  # DML on the clone works
    assert c.read().filter("id = 2").collect()[0]["value"] == 0


def test_streaming_source_reads_through_map(spark):
    import uuid

    from delta_lake_play_spark.sources.table_stream import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    t = _mk(spark)
    t.rename_column("x", "value")
    t.append(spark.createDataFrame([(9, 9, "z")], "id long, value long, tag string"))
    name = "colmap_stream_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("versioned_table")
        .load(t.path)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert got.columns == ["id", "value", "tag"]
    assert got.filter("id = 2").collect()[0]["value"] == 4
    assert got.filter("id = 9").collect()[0]["value"] == 9


def test_mirror_column_mapping_protocol(spark):
    t = _mk(spark, delta_mirror=True, enable_cdf=True)
    t.rename_column("x", "value")      # v1: mapping turns on here
    t.update({"value": F.col("value") + 100}, "id >= 4")  # v2
    t.drop_column("tag")               # v3
    ddir = os.path.join(t.path, "_delta_log")

    with open(os.path.join(ddir, f"{1:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    proto = [a["protocol"] for a in actions if "protocol" in a]
    assert proto == [{"minReaderVersion": 2, "minWriterVersion": 5}]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["value"]["delta.columnMapping.physicalName"] == "x"
    assert fields["id"]["delta.columnMapping.physicalName"] == "id"
    ids = [m["delta.columnMapping.id"] for m in fields.values()]
    assert sorted(ids) == [1, 2, 3]

    # protocol snapshot reader == private read, logical names
    snap = read_delta_snapshot(spark, t.path)
    assert snap.columns == ["id", "value"]
    pa = snap.orderBy("id").toPandas()
    pb = t.read().orderBy("id").toPandas()
    assert pa.equals(pb)
    # time travel through the protocol log shows v0 names
    assert read_delta_snapshot(spark, t.path, version=0).columns == [
        "id", "x", "tag",
    ]
    # protocol CDF reader == internal feed
    a = t.table_changes(2).drop("_commit_timestamp")
    b = read_delta_changes(spark, t.path, 2).drop("_commit_timestamp")
    key = ["_commit_version", "_change_type", "id"]
    assert (
        b.select(*a.columns).orderBy(*key).toPandas().equals(
            a.orderBy(*key).toPandas()
        )
    )


def test_mirror_mapped_dv_materialization(spark):
    t = _mk(spark, delta_mirror=True)
    t.rename_column("x", "value")
    t.delete_mor("id < 2")  # DV on a mapped table: materialized mirror
    snap = read_delta_snapshot(spark, t.path)
    assert snap.count() == 4
    pa = snap.orderBy("id").toPandas()
    pb = t.read().orderBy("id").toPandas()
    assert pa.equals(pb)
