"""File-level data skipping via commit-log min/max stats
(SURVEY.md §4: "our commit log stores per-file min/max of key cols;
planner selects snapshot files").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_play_spark.sources.catalog import load_table
from delta_lake_play_spark.table.versioned import VersionedTable, temp_table_path


def _make_table(spark, sf_dir):
    # Range-partition by the skip key so files carry disjoint ranges —
    # exactly how a real table would be laid out for skipping.
    li = load_table(spark, sf_dir, "lineitem").repartitionByRange(8, "l_orderkey")
    return VersionedTable.create(spark, temp_table_path("skip"), li), li


def test_log_carries_per_file_stats(spark, sf_dir):
    table, _ = _make_table(spark, sf_dir)
    entry = table._read_log(0)
    assert len(entry["files"]) >= 2
    for f in entry["files"]:
        assert f["num_rows"] > 0
        lo, hi = f["stats"]["l_orderkey"]
        assert lo <= hi


def test_range_read_prunes_files_and_matches_full_filter(spark, sf_dir):
    table, li = _make_table(spark, sf_dir)
    lo, hi = 100, 500
    pruned = table.read_range("l_orderkey", lo, hi)
    # Fewer files opened than the snapshot holds…
    n_total = len(table._read_log(0)["files"])
    assert len(pruned.inputFiles()) < n_total
    # …but exactly the same rows as an unpruned filter.
    expected = li.filter(F.col("l_orderkey").between(lo, hi))
    assert pruned.count() == expected.count()
    assert pruned.select(F.sum("l_orderkey")).first()[0] == (
        expected.select(F.sum("l_orderkey")).first()[0]
    )


def test_range_read_empty_band(spark, sf_dir):
    table, _ = _make_table(spark, sf_dir)
    assert table.read_range("l_orderkey", -100, -1).count() == 0


def test_open_bounds(spark, sf_dir):
    table, li = _make_table(spark, sf_dir)
    n = li.filter(F.col("l_orderkey") >= 5000).count()
    assert table.read_range("l_orderkey", lower=5000).count() == n


def test_partitioned_table_prunes_directories(spark, sf_dir):
    from delta_lake_play_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    table = VersionedTable.create(
        spark, temp_table_path("evpart"), ev, partition_by=["event_type"]
    )
    one_type = table.to_df().where(F.col("event_type") == "click")
    # Pruning happens at planning time: the partition filter appears
    # in the scan node (inputFiles() would list the whole file index).
    plan = one_type._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    assert one_type.count() == ev.where(F.col("event_type") == "click").count()
    # DML preserves the layout: next version is still partitioned.
    table.delete(F.col("event_type") == "view")
    assert table.partition_columns() == ["event_type"]
    v1 = table.to_df()
    assert v1.where(F.col("event_type") == "view").count() == 0
    assert any("event_type=click" in f for f in v1.inputFiles())


def test_read_range_on_partitioned_table(spark, sf_dir):
    from delta_lake_play_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    table = VersionedTable.create(
        spark, temp_table_path("evpart2"), ev, partition_by=["event_type"]
    )
    got = table.read_range("user_id", 0, 5)
    expected = ev.where(F.col("user_id").between(0, 5))
    assert got.count() == expected.count()
    # Partition columns survive leaf-file addressing (basePath).
    assert "event_type" in got.columns
    assert got.where(F.col("event_type").isNull()).count() == 0


def test_optimize_compacts_and_improves_clustering(spark, sf_dir):
    from delta_lake_play_spark.sources.catalog import load_table

    # 32 shuffled files: every file spans nearly the full key range,
    # so stats-based pruning can't drop anything.
    li = load_table(spark, sf_dir, "lineitem").repartition(32)
    table = VersionedTable.create(spark, temp_table_path("opt"), li)
    before = table._read_log(0)["files"]
    assert len(before) > 8
    pruned_before = len(table.read_range("l_orderkey", 100, 500).inputFiles())

    v = table.optimize(target_files=8, cluster_by=["l_orderkey"])
    after = table._read_log(v)["files"]
    assert len(after) <= 8
    # Content identical…
    assert table.read(version=v).count() == li.count()
    # …and the clustered layout now actually prunes.
    pruned_after = len(table.read_range("l_orderkey", 100, 500).inputFiles())
    assert pruned_after < len(after)
    assert pruned_after <= pruned_before


def test_change_feed(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), False),
        ]
    )
    t = VersionedTable.create(
        spark, temp_table_path("cdc"), spark.createDataFrame([(1, "a"), (2, "b")], schema)
    )
    t.merge(spark.createDataFrame([(2, "B"), (3, "c")], schema), key="id")
    rows = {(r.id, r.name, r._change_type) for r in t.changes(0, 1).collect()}
    assert rows == {
        (2, "B", "insert"),
        (3, "c", "insert"),
        (2, "b", "delete"),
    }


def test_zorder_prunes_on_both_columns(spark, sf_dir):
    from delta_lake_play_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    table = VersionedTable.create(spark, temp_table_path("zord"), li)
    v = table.optimize(target_files=16, zorder_by=["l_orderkey", "l_partkey"])
    n_files = len(table._read_log(v)["files"])
    # A narrow band on EITHER column must prune files — lexicographic
    # clustering would only manage this for its leading column.
    for col in ("l_orderkey", "l_partkey"):
        lo = 1
        hi = int(li.agg(F.expr(f"percentile({col}, 0.1)")).first()[0])
        pruned = len(table.read_range(col, lo, hi, version=v).inputFiles())
        assert pruned < n_files, f"no pruning on {col}: {pruned}/{n_files}"
        full = li.filter(F.col(col).between(lo, hi))
        assert table.read_range(col, lo, hi, version=v).count() == full.count()


def test_footer_stats_match_recomputed_minmax(spark, sf_dir):
    """Commit-log stats come from parquet footers (no rescan) — they
    must equal the true per-file min/max, not merely contain it:
    too-wide stats silently disable skipping, too-narrow break it."""
    table, _ = _make_table(spark, sf_dir)
    entry = table._read_log(0)
    for f in entry["files"]:
        df = spark.read.parquet(table._abs(f["path"]))
        for col in ("l_orderkey", "l_quantity", "l_returnflag"):
            lo, hi = f["stats"][col]
            row = df.agg(F.min(col), F.max(col)).first()
            assert (lo, hi) == (row[0], row[1]), (f["path"], col)
        n = df.count()
        assert n == f["num_rows"]
