"""Runtime-filter scan reduction (SURVEY.md §2.1/§2.3 extension).

Two optimizer capabilities that only matter at scale — both reduce
the FACT-side scan using information that exists only at runtime, on
the other side of a join:

- **Dynamic partition pruning** (``scan_dpp_partition_join``): the
  fact table is laid out by the join key; the dim side's selective
  filter is evaluated first and its surviving keys are pushed into
  the fact scan's PartitionFilters as a ``dynamicpruningexpression``,
  so whole directories are never opened. At 100 TB with a
  day/tenant-partitioned fact this is the difference between reading
  3 partitions and reading 3 000.
- **Runtime bloom-filter join pruning** (``join_runtime_bloom``): when
  the join key is NOT the layout key, Spark can still build a bloom
  filter over the filtered build side and evaluate
  ``BloomFilterMightContain`` inside the fact scan, discarding
  non-joining rows before the shuffle. Shuffle volume drops from
  |fact| to ~|semi-join(fact)|.

Reference scope note: the reference (nagi49000/delta-lake-play,
``api.py:55-107``) reads a single tiny Delta table and has no join
pruning surface; these keys cover the scan-reduction behavior its
Delta/Spark storage stack provides implicitly at scale.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.functions.exact import dsum, sql_dsum
from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- scan_dpp_partition_join ----------------------------------------------

_DPP_ORACLE = f"""
WITH dim AS (
  SELECT event_type,
         CASE WHEN length(event_type) % 2 = 0 THEN 'hot' ELSE 'cold' END
           AS segment
  FROM (SELECT DISTINCT event_type FROM events)
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       {sql_dsum("e.value")} AS sum_value
FROM events e
JOIN dim ON e.event_type = dim.event_type
WHERE dim.segment = 'hot'
GROUP BY e.event_type
"""


def _dpp_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the DPP fixture: events hive-partitioned by event_type
    (the fact) and a tiny event_type→segment dim, both as parquet so
    each is a real file-source relation at plan time."""
    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dlps-dpp-")
    fact_path = os.path.join(base, "events_by_type")
    dim_path = os.path.join(base, "type_dim")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "segment",
            F.when(F.length("event_type") % 2 == 0, F.lit("hot")).otherwise(
                F.lit("cold")
            ),
        )
    )
    dim.coalesce(1).write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def dpp_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy DPP join (shared with the plan-shape test)."""
    fact_path, dim_path = _dpp_layout(spark, sf_dir)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("segment") == "hot")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@register("scan_dpp_partition_join", oracle=_DPP_ORACLE)
def scan_dpp_partition_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: events laid out by event_type, dim
    filtered to its 'hot' segment at runtime. Catalyst plans the fact
    scan with ``PartitionFilters: [dynamicpruningexpression(...)]``
    reusing the dim's broadcast exchange — the fact directories for
    cold event types are never listed or opened. The plan shape is
    pinned by tests/test_plan_shapes.py::test_dpp_prunes_fact_scan."""
    return dpp_join_df(spark, sf_dir)


# --- join_runtime_bloom ---------------------------------------------------

_BLOOM_ORACLE = f"""
SELECT l.l_returnflag,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_extendedprice")} AS sum_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
"""

# Injection preconditions (InjectRuntimeFilter): creation side under
# creationSideThreshold, application side a file-source scan over
# applicationSideScanSizeThreshold. The 10 GB default application
# threshold is sized for real clusters — at test SF the fact side is
# MBs, so the threshold is lowered inside the builder (and restored);
# at 100 TB the defaults fire on their own.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy bloom-pruned join (shared with the plan-shape test);
    caller owns the conf window."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@register("join_runtime_bloom", oracle=_BLOOM_ORACLE)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning on a non-layout join key:
    the filtered orders side builds a bloom filter (one extra
    aggregate over the already-filtered build side) and the lineitem
    scan evaluates ``BloomFilterMightContain`` BEFORE the shuffle, so
    non-joining fact rows never ride the exchange. Broadcast is
    disabled in the conf window to exercise the shuffle-join path the
    filter exists for (at 100 TB the build side often exceeds the
    broadcast threshold while staying bloom-sized). The result is
    materialized inside the conf window (``localCheckpoint``) so the
    restored session confs cannot re-plan it."""
    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        return bloom_join_df(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- scan_agg_pushdown ----------------------------------------------------

_AGG_PUSH_ORACLE = """
SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key,
       COUNT(*) AS n_rows
FROM lineitem
"""

_AGG_PUSH_CONFS = {
    # key is case-sensitive: ...aggregatePushdown (lowercase d)
    "spark.sql.parquet.aggregatePushdown": "true",
    # aggregate pushdown is a DSv2 capability; route parquet off the
    # V1 file-source path for this window
    "spark.sql.sources.useV1SourceList": "",
}


def agg_pushdown_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy footer-answered aggregate (shared with the plan test);
    caller owns the conf window."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("scan_agg_pushdown", oracle=_AGG_PUSH_ORACLE)
def scan_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX/COUNT answered from parquet footer statistics — the
    scan carries ``PushedAggregation: [MIN(..), MAX(..), COUNT(*)]``
    and reads row-group metadata instead of data pages. At 100 TB
    this is the difference between a metadata sweep and a full column
    scan for table-profile queries. Materialized inside the conf
    window (the DSv2 route + pushdown flags are plan-time state)."""
    prev = {k: spark.conf.get(k, None) for k in _AGG_PUSH_CONFS}
    for k, v in _AGG_PUSH_CONFS.items():
        spark.conf.set(k, v)
    try:
        return agg_pushdown_df(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
