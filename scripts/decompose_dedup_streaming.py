"""Measured decomposition of llm_dedup_streaming's bench cost
(VERDICT r9 ask #5: four rounds as the suite's slowest key earns a
breakdown of stream startup vs per-batch signing vs commit cost).

Replays the key's exact phases separately at $SPARK_GRAFT_SF_DIR
(default sf0.1) and prints a JSON breakdown:

  setup_store   corpus signing + store/dups table creates
  setup_bronze  bronze create + second commit (two stream batches)
  stream_noop   the SAME stream wiring (Python DataSource source,
                checkpoint, availableNow trigger) with a sink that
                only counts — pure stream machinery cost
  batch_dedup   incremental_minhash_flagged per batch, forced via
                noop writes, batch mode (no stream, no commits)
  commits       the 2x2 txn-tagged appends incl. the idempotent
                replay no-ops
  full_key      the registered query end-to-end, for reconciliation

Usage: python scripts/decompose_dedup_streaming.py [sf_dir]
"""

import json
import os
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from delta_lake_play_spark.operators.dedup import (  # noqa: E402
    incremental_minhash_flagged,
    minhash_signature_table,
)
from delta_lake_play_spark.queries.llm_dedup import _INC_THRESHOLD  # noqa: E402
from delta_lake_play_spark.session import get_spark  # noqa: E402
from delta_lake_play_spark.sources.catalog import load_table  # noqa: E402
from delta_lake_play_spark.sources.table_stream import (  # noqa: E402
    VersionedTableDataSource,
)
from delta_lake_play_spark.table.versioned import (  # noqa: E402
    VersionedTable,
    temp_table_path,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

spark = get_spark("dedup-streaming-decompose", cpus=32)
spark.dataSource.register(VersionedTableDataSource)
spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()  # warm

t: dict[str, float] = {}


def clock(name):
    class _C:
        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            t[name] = round(time.perf_counter() - self.t0, 3)

    return _C()


d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
corpus = d.filter(F.col("doc_id") % 3 != 0)
arrivals = d.filter(F.col("doc_id") % 3 == 0)

with clock("setup_store"):
    store = VersionedTable.create(
        spark,
        temp_table_path("decomp-store"),
        minhash_signature_table(corpus, "doc_id", "text"),
    )
    dups = VersionedTable.create(
        spark, temp_table_path("decomp-dups"), spark.createDataFrame([], "doc_id bigint")
    )

with clock("setup_bronze"):
    (b1,) = arrivals.agg(F.expr("percentile(doc_id, 0.5)")).first()
    batch1 = arrivals.filter(F.col("doc_id") <= b1).coalesce(1)
    batch2 = arrivals.filter(F.col("doc_id") > b1).coalesce(1)
    bronze = VersionedTable.create(spark, temp_table_path("decomp-bronze"), batch1)
    bronze.append(batch2)

with clock("stream_noop"):
    counted = []
    q = (
        spark.readStream.format("versioned_table")
        .option("maxVersionsPerTrigger", "1")
        .load(bronze.path)
        .writeStream.foreachBatch(lambda df, bid: counted.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="decomp_noop_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

with clock("batch_dedup"):
    flagged_frames = []
    sig_frames = []
    store_df = store.to_df()
    for b in (batch1, batch2):
        flagged, new_sigs = incremental_minhash_flagged(
            store_df, b, "doc_id", "text", _INC_THRESHOLD
        )
        flagged.write.mode("overwrite").format("noop").save()
        new_sigs.write.mode("overwrite").format("noop").save()
        flagged_frames.append(flagged)
        sig_frames.append(new_sigs)
        store_df = store_df.unionByName(new_sigs)

with clock("commits"):
    app_id = "decomp-" + uuid.uuid4().hex[:8]
    for bid, (flagged, new_sigs) in enumerate(zip(flagged_frames, sig_frames)):
        for _replay in range(2):
            dups.append(flagged, txn_app_id=app_id + "-dups", txn_version=bid)
            store.append(new_sigs, txn_app_id=app_id + "-sigs", txn_version=bid)
        new_sigs.unpersist()

with clock("full_key"):
    from delta_lake_play_spark.registry import all_queries

    all_queries()["llm_dedup_streaming"](spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

parts = ["setup_store", "setup_bronze", "stream_noop", "batch_dedup", "commits"]
t["parts_sum"] = round(sum(t[p] for p in parts), 3)
t["n_stream_batches"] = len(counted)
print(json.dumps(t, indent=1))
