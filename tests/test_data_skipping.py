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
