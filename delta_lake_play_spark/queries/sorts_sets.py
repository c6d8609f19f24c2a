"""Sorts / limits / top-k (SURVEY.md §2.6) and set ops (§2.7).

The reference sorts only in the meta plane (history keyed by version,
``api.py:67``) and implies UNION-ALL append semantics through the
Delta DML surface (``README.md:11``). Sorts here are
range-partitioned (Spark samples key ranges, no single-node sort);
top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows — never a full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- sort_by_key (api.py:67 shape, data plane) ---------------------------

_SORT_ORACLE = "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey"


@register("sort_by_key", oracle=_SORT_ORACLE)
def sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --- sort_multi_col_nulls: multi-column sort with null placement ----------

_SORT_NULLS_ORACLE = """
SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
FROM customer
WHERE c_acctbal > 9500 OR c_acctbal < -900
ORDER BY seg DESC NULLS LAST, c_acctbal ASC, c_custkey
"""


@register("sort_multi_col_nulls", oracle=_SORT_NULLS_ORACLE)
def sort_multi_col_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.filter((F.col("c_acctbal") > 9500) | (F.col("c_acctbal") < -900))
        .select("c_custkey", seg.alias("seg"), "c_acctbal")
        .orderBy(
            F.col("seg").desc_nulls_last(), F.col("c_acctbal").asc(), F.col("c_custkey")
        )
    )


# --- limit_n: deterministic first-N (ordered) ------------------------------

_LIMIT_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@register("limit_n", oracle=_LIMIT_ORACLE)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --- topk_global: TakeOrderedAndProject -------------------------------------

_TOPK_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey LIMIT 20
"""


@register("topk_global", oracle=_TOPK_ORACLE)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --- set_union_all: append semantics (README.md:11) -------------------------

_UNION_ORACLE = """
SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders WHERE o_totalprice > 450000
"""


@register("set_union_all", oracle=_UNION_ORACLE)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    big = o.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    return urgent.unionByName(big)


# --- set_distinct: duplicate elimination -------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode FROM (
  SELECT l_returnflag, l_linestatus,
         CASE WHEN l_quantity < 25 THEN 'small' ELSE 'bulk' END AS l_shipmode
  FROM lineitem)
"""


@register("set_distinct", oracle=_DISTINCT_ORACLE)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.when(F.col("l_quantity") < 25, "small").otherwise("bulk").alias("l_shipmode"),
    ).distinct()


# --- set_intersect: common rows of two queries --------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).intersect(year(1996))


# --- set_multiset_ops -----------------------------------------------------

# EXCEPT ALL / INTERSECT ALL: bag semantics that preserve duplicate
# multiplicity (DISTINCT-based set ops collapse it). The multiplicity
# arithmetic — count(a) - count(b) copies survive EXCEPT ALL,
# min(count(a), count(b)) survive INTERSECT ALL — is exactly what a
# change-feed diff needs (a row updated twice must appear twice).

_MULTISET_ORACLE = """
WITH a AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0),
b AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0)
SELECT 'except_all' AS op, o_orderstatus, o_orderpriority
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
UNION ALL
SELECT 'intersect_all', o_orderstatus, o_orderpriority
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
"""


@register("set_multiset_ops", oracle=_MULTISET_ORACLE)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll + intersectAll over two overlapping low-cardinality
    projections, tagged and unioned. Spark plans both as a single
    count-aggregate + generate (multiplicity replay) — one shuffle
    each, no join."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_orderpriority")
    b = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderstatus", "o_orderpriority")
    ex = a.exceptAll(b).select(
        F.lit("except_all").alias("op"), "o_orderstatus", "o_orderpriority"
    )
    inter = a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "o_orderstatus", "o_orderpriority"
    )
    return ex.unionByName(inter)


# --- sort_within_partitions -----------------------------------------------

# Local (per-partition) sort: no range exchange, no global order —
# the sort you run BEFORE a write so each parquet file is clustered
# on the sort key and its pages/row-groups carry tight min/max stats.
# The result SET is identical to the unsorted projection (ordering is
# physical layout, not semantics), which is exactly what the
# order-insensitive oracle hash checks.

_SORT_LOCAL_ORACLE = """
SELECT l_orderkey, l_shipdate, l_quantity
FROM lineitem WHERE l_quantity >= 45
"""


@register("sort_within_partitions", oracle=_SORT_LOCAL_ORACLE)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions on the ship date: a mapPartitions-local
    sort with NO exchange in the plan (pinned in
    tests/test_plan_shapes.py) — at 100 TB this is how you lay out
    files for date-range data skipping without paying a global
    range-partitioned sort."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return li.select("l_orderkey", "l_shipdate", "l_quantity").sortWithinPartitions(
        "l_shipdate"
    )


# --- limit_offset_page: ordered pagination ---------------------------------
# OFFSET pagination (SQL:2008 / Spark 3.4+ DataFrame.offset): page 3
# of the price-ranked orders. The plan is the global-top-(k+offset)
# shape — CollectLimit with a skip — which is fine for shallow pages
# but O(offset + k) per page and re-sorts the head every request; at
# 100 TB deep pagination uses KEYSET predicates instead (WHERE
# (price, key) < last-seen, an indexable/pushable filter — the same
# rows, constant cost per page). This key demonstrates the OFFSET
# surface; the docstring is the scale warning.

_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
"""


@register("limit_offset_page", oracle=_OFFSET_ORACLE)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 (rows 21-30) of orders by price: ORDER BY ... LIMIT 10
    OFFSET 20 via the DataFrame offset() API."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )
