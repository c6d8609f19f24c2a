"""SetTransaction (Delta ``txn`` action): idempotent appends — the
exactly-once primitive for streaming foreachBatch sinks."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from delta_lake_play_spark.table.versioned import (
    VersionedTable,
    temp_table_path,
)


def _mk(spark, **kwargs):
    return VersionedTable.create(
        spark,
        temp_table_path("txn"),
        spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("x")),
        **kwargs,
    )


def test_replayed_batch_is_noop(spark):
    t = _mk(spark)
    batch = spark.createDataFrame([(10, 1)], "id long, x long")
    v1 = t.append(batch, txn_app_id="sink", txn_version=0)
    assert v1 == 1 and t.last_txn_version("sink") == 0
    # replay of the same batch: no commit, no rows
    v2 = t.append(batch, txn_app_id="sink", txn_version=0)
    assert v2 == 1 and t.latest_version() == 1
    assert t.read().count() == 4
    # an OLDER txn version is also refused
    t.append(batch, txn_app_id="sink", txn_version=5)
    assert t.append(batch, txn_app_id="sink", txn_version=3) == 2
    assert t.read().count() == 5


def test_separate_app_ids_are_independent(spark):
    t = _mk(spark)
    batch = spark.createDataFrame([(10, 1)], "id long, x long")
    t.append(batch, txn_app_id="a", txn_version=0)
    t.append(batch, txn_app_id="b", txn_version=0)  # applies: different app
    assert t.read().count() == 5
    assert t.last_txn_version("a") == 0
    assert t.last_txn_version("b") == 0
    assert t.last_txn_version("c") is None


def test_mismatched_txn_args_raise(spark):
    t = _mk(spark)
    with pytest.raises(ValueError, match="txn_app_id"):
        t.append(t.read(), txn_app_id="a")


def test_racing_writers_apply_batch_exactly_once(spark):
    t = _mk(spark)
    batch = spark.createDataFrame([(99, 9)], "id long, x long")
    errs = []

    def run():
        try:
            t2 = VersionedTable(spark, t.path)
            t2.append(batch, txn_app_id="race", txn_version=7)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # the conflict-retry path re-validates the txn, so exactly one
    # writer's batch landed no matter who won the version race
    assert t.read().filter("id = 99").count() == 1


def test_mirror_emits_txn_action_and_checkpoint_reconciles(spark):
    t = _mk(spark, delta_mirror=True)
    batch = spark.createDataFrame([(50, 5)], "id long, x long")
    for i in range(10):  # crosses the checkpoint-every-10 boundary
        t.append(batch.withColumn("id", F.col("id") + i),
                 txn_app_id="sink", txn_version=i)
    ddir = os.path.join(t.path, "_delta_log")
    with open(os.path.join(ddir, f"{1:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    txns = [a["txn"] for a in actions if "txn" in a]
    assert txns == [{"appId": "sink", "version": 0,
                     "lastUpdated": txns[0]["lastUpdated"]}]

    import pyarrow.parquet as pq

    cp = pq.read_table(os.path.join(ddir, f"{10:020d}.checkpoint.parquet"))
    cp_txns = [r["txn"] for r in cp.to_pylist() if r.get("txn")]
    assert len(cp_txns) == 1
    assert cp_txns[0]["appId"] == "sink" and cp_txns[0]["version"] == 9
