"""Physical-plan shape assertions — the 100 TB discipline as tests.

Correct results can hide a plan that would collapse at scale (full
scans where a filter should push down, shuffles where a broadcast
should happen). These tests pin the plan properties that matter:
predicate pushdown into the Parquet scan, column pruning, broadcast
joins for small dims, and TakeOrderedAndProject for global top-k.
"""

from __future__ import annotations

import pytest

from delta_lake_play_spark.plans import assert_scalable, formatted_plan, summarize
from delta_lake_play_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, key: str) -> str:
    return formatted_plan(QUERIES[key](spark, sf_dir))


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    # The range predicate itself, not just IsNotNull, must push down.
    assert_scalable(
        QUERIES["filter_range"](spark, sf_dir), require_pushdown_on="l_shipdate"
    )


def test_column_pruning_on_flagship(spark, sf_dir):
    # Q1 needs 7 of lineitem's 16 columns; the scan must not read e.g.
    # l_comment or l_orderkey.
    s = assert_scalable(
        QUERIES["agg_group_sum_avg_count"](spark, sf_dir),
        require_pruned_out="l_comment",
    )
    assert all("l_orderkey" not in r for r in s.read_schemas)
    assert any("l_quantity" in r for r in s.read_schemas)


def test_small_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_all_broadcast(spark, sf_dir):
    # lineitem→orders→customer→nation→region: every dim side fits the
    # broadcast threshold at test scale; the fact table must stream.
    plan = _plan(spark, sf_dir, "join_multiway_star")
    assert "BroadcastHashJoin" in plan


def test_global_topk_avoids_total_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_global")
    assert "TakeOrderedAndProject" in plan, "global top-k should not range-sort everything"


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_similarity_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_assignment_shuffles_n_rows_not_n_times_c(spark, sf_dir):
    """Cell assignment must not shuffle n×C scored rows: centroids
    broadcast, the argmax is a map-side-combined max aggregate (no
    window), and the only exchange carries the per-vector partials."""
    from delta_lake_play_spark.operators.similarity import ivf_assign
    from delta_lake_play_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(
        e, e.where(F.col("vec_id") % 50 == 0), "vec_id", "embedding"
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "argmax must be an aggregate, not a window"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # partial + final HashAggregate pair around a single n-row exchange
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "partial_max" in plan or "partial" in plan.lower()


def test_ivf_cell_count_is_capped():
    """r7 sf1 anchor regression: the centroid set must NOT grow
    linearly with the corpus (O(n²) assign). stride = max(50,
    ceil(n/100)) keeps the historical layout at driver-fixture sizes
    and caps cells at ~100 beyond."""
    from delta_lake_play_spark.queries.llm_similarity import (
        _IVF_MAX_CELLS,
        _IVF_MIN_STRIDE,
    )

    def stride(n):  # the pure math of _ivf_stride, no Spark needed
        return max(_IVF_MIN_STRIDE, -(-n // _IVF_MAX_CELLS))

    assert stride(500) == 50 and stride(5000) == 50  # fixture layout kept
    for n in (50_000, 1_000_000, 10**9):
        assert n // stride(n) <= _IVF_MAX_CELLS + 1, n


@pytest.mark.parametrize(
    "key",
    [
        "llm_dedup_near_minhash",
        "llm_dedup_simhash",
        "join_self_pairs",
        "join_range_bucketed",
    ],
)
def test_self_join_pairs_are_bucketed_not_cartesian(spark, sf_dir, key):
    plan = _plan(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key} degenerated to a cartesian product"


def test_q3_pushdown_broadcast_and_topk(spark, sf_dir):
    """TPC-H Q3 shape: both date filters reach the scans, the
    filtered customer side broadcasts, and the top-10 compiles to
    TakeOrderedAndProject instead of a global sort."""
    s = assert_scalable(
        QUERIES["join_shipping_priority"](spark, sf_dir),
        require_pushdown_on="l_shipdate",
    )
    assert s.n_broadcast_joins >= 1
    assert s.has_take_ordered
    assert any("o_orderdate" in f for f in s.pushed_filters)


def test_range_bucketed_join_is_single_pass(spark, sf_dir):
    """The bucketed interval join must hash-shuffle (no
    range-partition sampling pass, no nested-loop): every join in
    the plan is an equi-join and exchange count stays bounded."""
    s = summarize(QUERIES["join_range_bucketed"](spark, sf_dir))
    assert not s.has_cartesian
    # probe shuffle + build shuffle + final agg shuffle
    assert s.n_exchanges <= 3
    assert s.n_sort_merge_joins + s.n_broadcast_joins >= 1


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_bucketed_colocated")
    assert "SortMergeJoin" in plan
    s = summarize(QUERIES["join_bucketed_colocated"](spark, sf_dir))
    assert s.n_exchanges == 0, (
        "bucketed co-located join must not shuffle either side"
    )


def test_versioned_read_keeps_pushdown_and_pruning(spark, sf_dir):
    """The explicit-file-list read path must not cost Catalyst its
    parquet pushdown: filters reach the scan and the ReadSchema is
    pruned to the projection."""
    from pyspark.sql import functions as F

    from delta_lake_play_spark.sources.catalog import load_table
    from delta_lake_play_spark.table.versioned import VersionedTable, temp_table_path

    li = load_table(spark, sf_dir, "lineitem").repartitionByRange(4, "l_orderkey")
    t = VersionedTable.create(spark, temp_table_path("push"), li)
    df = t.to_df().filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    """EXISTS must become a left-semi join (one shuffle), never a
    per-outer-row subquery execution, and the orders date range must
    still push into the scan after decorrelation."""
    plan = _plan(spark, sf_dir, "sub_exists_late_lineitem")
    assert "LeftSemi" in plan
    s = summarize(QUERIES["sub_exists_late_lineitem"](spark, sf_dir))
    assert any("o_orderdate" in p for p in s.pushed_filters)


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sub_not_exists_quiet_customers")
    assert "LeftAnti" in plan
    # the o_totalprice predicate belongs in the orders scan, not the join
    s = summarize(QUERIES["sub_not_exists_quiet_customers"](spark, sf_dir))
    assert any("o_totalprice" in p for p in s.pushed_filters)


def test_correlated_scalar_subquery_aggregates_once(spark, sf_dir):
    """Q17 shape: the correlated AVG must run as ONE per-part aggregate
    joined back — not re-executed per outer row (no nested subquery
    node left in the physical plan)."""
    plan = _plan(spark, sf_dir, "sub_scalar_small_quantity")
    # decorrelated: per-part aggregate + joins, no correlated-subquery
    # node surviving into the physical plan
    assert "HashAggregate" in plan
    # formatted explain names each scan twice (tree + detail block):
    # lineitem (outer), lineitem (per-part avg), part = 3 scans max
    assert plan.count("Scan parquet") <= 6, "inner lineitem must scan once, not per row"
    s = summarize(QUERIES["sub_scalar_small_quantity"](spark, sf_dir))
    assert not s.has_cartesian


def test_lateral_limit_becomes_window_topk(spark, sf_dir):
    """LATERAL ... LIMIT must not re-run the inner query per nation:
    Catalyst plans a single join + per-key Window (or equivalent),
    with no cartesian product."""
    s = summarize(QUERIES["sub_lateral_topk_per_nation"](spark, sf_dir))
    assert not s.has_cartesian
    plan = _plan(spark, sf_dir, "sub_lateral_topk_per_nation")
    assert "Window" in plan or "LeftSemi" in plan


def test_not_in_plans_null_aware_anti_join(spark, sf_dir):
    """NOT IN against a nullable subquery must plan the null-aware
    variant of the anti join (the trailing `true` flag on the
    BroadcastHashJoin), not a plain LeftAnti — plain anti would
    return rows the standard says to drop."""
    df = QUERIES["sub_not_in_null_semantics"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight, true" in plan


def test_q19_disjunction_prunes_both_scans(spark, sf_dir):
    """TPC-H Q19: Catalyst must extract the per-side conjuncts common
    to every OR branch — the brand/size disjunction reaches the part
    scan and the quantity disjunction reaches the lineitem scan, so
    the OR is never evaluated row-by-row over the whole fact table."""
    s = summarize(QUERIES["join_disjunctive_pred"](spark, sf_dir))
    assert s.n_broadcast_joins >= 1
    assert any("l_quantity" in p for p in s.pushed_filters), (
        "quantity disjunction must prune the lineitem scan pre-join"
    )
    assert any("p_brand" in p for p in s.pushed_filters), (
        "brand disjunction must prune the part scan pre-join"
    )


def test_q10_topk_and_date_pushdown(spark, sf_dir):
    """TPC-H Q10: the half-year date range reaches the orders scan,
    the returnflag filter reaches lineitem, nation broadcasts, and the
    top-20 compiles to TakeOrderedAndProject (no global sort)."""
    s = assert_scalable(
        QUERIES["join_returned_topcust"](spark, sf_dir),
        require_pushdown_on="o_orderdate",
    )
    assert s.has_take_ordered
    assert s.n_broadcast_joins >= 1
    assert any("l_returnflag" in p for p in s.pushed_filters)


def test_q14_promo_pushdown_and_broadcast(spark, sf_dir):
    """TPC-H Q14: ship-month range prunes the lineitem scan and part
    broadcasts — the join input is one month of the fact, not all of
    it."""
    s = assert_scalable(
        QUERIES["agg_promo_revenue"](spark, sf_dir),
        require_pushdown_on="l_shipdate",
    )
    assert s.n_broadcast_joins >= 1


def test_q15_max_revenue_is_broadcast_equality(spark, sf_dir):
    """TPC-H Q15: the scalar MAX joins back as a broadcast one-row
    equi-join; nothing in the plan is a cartesian product or a
    per-row subquery."""
    s = summarize(QUERIES["sub_top_supplier"](spark, sf_dir))
    assert not s.has_cartesian
    assert s.n_broadcast_joins >= 2  # max-row join + supplier dim join


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """At 100 TB the cheapest rows are the ones never shuffled:
    Spark's runtime Bloom-filter injection builds a filter from the
    selective (orders) side and applies it to the fact scan before
    the join shuffle. The defaults only arm beyond a 10GB fact scan,
    so this pins the behavior with thresholds scaled to test data —
    a separate SQLConf via newSession() so the shared session's
    plans are untouched."""
    from pyspark.sql import functions as F

    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    li = s2.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = s2.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 450000
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, "runtime bloom filter not injected"
    assert "might_contain" in plan, "fact side not filtered by the bloom filter"


def test_q7_broadcasts_all_dims(spark, sf_dir):
    """TPC-H Q7: supplier and both nation copies broadcast; no
    cartesian; the only shuffles belong to the fact-side joins and
    the final aggregate."""
    s = summarize(QUERIES["join_volume_shipping"](spark, sf_dir))
    assert not s.has_cartesian
    assert s.n_broadcast_joins >= 3


def test_q8_broadcasts_dims_and_pushes_region(spark, sf_dir):
    """TPC-H Q8: region/nation/supplier broadcast and the region
    filter prunes before the fact join."""
    s = summarize(QUERIES["join_market_share"](spark, sf_dir))
    assert not s.has_cartesian
    assert s.n_broadcast_joins >= 3


def test_pipeline_end2end_scans_corpus_once(spark, sf_dir):
    """The composed curation pipeline (gate → dedup → pack) must stay
    one logical plan over ONE scan of documents — a second scan would
    mean a stage boundary re-reading the corpus."""
    plan = _plan(spark, sf_dir, "llm_pipeline_end2end")
    # formatted explain names each scan twice (tree node + detail
    # block), so one physical scan appears at most twice
    assert plan.count("Scan parquet") <= 2
    s = summarize(QUERIES["llm_pipeline_end2end"](spark, sf_dir))
    assert not s.has_cartesian


def test_sort_within_partitions_has_no_exchange(spark, sf_dir):
    """The pre-write clustering sort must be partition-local: a Sort
    node with global=false and NO added exchange — a range shuffle
    here would be the cost the operator exists to avoid."""
    df = QUERIES["sort_within_partitions"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan
    assert "rangepartitioning" not in plan.lower()
    assert "Exchange" not in plan


def test_q6_all_predicates_push_to_scan(spark, sf_dir):
    """TPC-H Q6 is THE bandwidth query: date range and quantity must
    reach the parquet scan as pushed filters, and no join/exchange
    beyond the single-row final aggregate may appear."""
    s = assert_scalable(
        QUERIES["agg_revenue_band"](spark, sf_dir),
        require_pushdown_on="l_shipdate",
    )
    plan = _plan(spark, sf_dir, "agg_revenue_band")
    assert "Join" not in plan


def test_q2_min_cost_decorrelates_to_single_aggregate(spark, sf_dir):
    """The correlated per-part MIN must run as ONE aggregate joined
    back — never a per-row re-execution (no nested-loop/cartesian)."""
    s = summarize(QUERIES["sub_min_cost_supplier"](spark, sf_dir))
    assert not s.has_cartesian
    plan = _plan(spark, sf_dir, "sub_min_cost_supplier")
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_threshold_is_one_row_subquery(spark, sf_dir):
    """The global-total threshold must appear as a reusable scalar
    subquery, not a per-group recomputation: exactly two aggregates
    over lineitem (per-part + total), no cartesian."""
    s = summarize(QUERIES["sub_important_stock"](spark, sf_dir))
    assert not s.has_cartesian


def test_q20_semi_join_into_supplier(spark, sf_dir):
    """IN (GROUP BY ... HAVING scalar-subquery) must plan as a semi
    join against the aggregated fact, with the threshold broadcast."""
    plan = _plan(spark, sf_dir, "sub_excess_shippers")
    assert "LeftSemi" in plan
    s = summarize(QUERIES["sub_excess_shippers"](spark, sf_dir))
    assert not s.has_cartesian


def test_q9_dims_broadcast_and_like_prunes_part(spark, sf_dir):
    """part/supplier/nation broadcast; the name LIKE filter must prune
    the part scan before the fact join."""
    s = summarize(QUERIES["agg_profit_by_nation_year"](spark, sf_dir))
    assert not s.has_cartesian
    assert s.n_broadcast_joins >= 3
    plan = _plan(spark, sf_dir, "agg_profit_by_nation_year")
    assert "gear" in plan  # LIKE pushed toward the part scan


def test_dv_masked_read_broadcasts_small_dv_only(spark, tmp_path, monkeypatch):
    """Deletion-vector reads: the (path, pos) anti-join must broadcast
    the DV side while the masked-position total is under
    _DV_BROADCAST_MAX, and degrade to a shuffled anti-join (never an
    attempted broadcast that could OOM) when it is not."""
    from pyspark.sql import functions as F

    from delta_lake_play_spark.table import versioned as vmod
    from delta_lake_play_spark.table.versioned import VersionedTable

    df = spark.range(0, 5_000).withColumn("k", F.col("id") % 7)
    t = VersionedTable.create(
        spark, str(tmp_path / "dv-plan"), df.repartitionByRange(4, "id")
    )
    t.delete_mor(F.col("id") % 10 == 3)  # 500 masked positions

    plan_small = t.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan_small
    assert "BroadcastHashJoin" in plan_small, "small DV should broadcast"

    # Over the threshold our code must NOT force a broadcast hint; with
    # auto-broadcast also off (as a size-estimated huge DV would be),
    # the planner must fall back to a shuffled anti-join.
    monkeypatch.setattr(vmod, "_DV_BROADCAST_MAX", 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_big = t.to_df()._jdf.queryExecution().executedPlan().toString()
        anti_lines = [ln for ln in plan_big.splitlines() if "LeftAnti" in ln]
        assert anti_lines
        # the tiny rel→abs path-map join stays broadcast by design;
        # only the (path, pos) ANTI-join must degrade to a shuffle
        assert all("BroadcastHashJoin" not in ln for ln in anti_lines), (
            "oversized DV must fall back to a shuffled anti-join"
        )
        assert t.to_df().count() == 4_500  # mask applied on the fallback path
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q12_date_window_pushes_to_fact_scan(spark, sf_dir):
    """TPC-H Q12 shape: the one-year ship window must reach the
    lineitem scan so the join input is a year of the fact, and the
    conditional counts stay a hash aggregate (no window/sort)."""
    assert_scalable(
        QUERIES["agg_shipmode_priority"](spark, sf_dir),
        require_pushdown_on="l_shipdate",
    )
    assert "Window" not in _plan(spark, sf_dir, "agg_shipmode_priority")


def test_q21_decorrelation_has_no_cartesian_or_window(spark, sf_dir):
    """TPC-H Q21 shape: the doubly-correlated EXISTS pair must
    decorrelate into orderkey-keyed aggregates — no cartesian
    fact-x-fact probe — and the final top-10 must compile to
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_dir, "sub_waiting_orders")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir):
    """The lang='de' read over the hive-partitioned sink must prune at
    the directory level (PartitionFilters), not post-filter rows."""
    plan = _plan(spark, sf_dir, "sink_partitioned_parquet")
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan[:2000]


def test_global_shuffle_windows_are_subsharded(spark, sf_dir):
    """The two-level rank must never window on shard alone (whole
    shard in one task): every Window partition spec carries the
    subshard (offset table) or both keys (rank)."""
    import re

    plan = _plan(spark, sf_dir, "llm_global_shuffle")
    # The row-level rank window must partition on (shard, subshard);
    # the cumulative-offset window may key on shard alone because it
    # runs over the shards x subshards COUNTS table, not the corpus.
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:1500]
    for s in specs:
        assert "subshard" in s, f"rank window partitioned by shard alone: {s}"


def test_lm_score_preaggregates_before_model_join(spark, sf_dir):
    """The bigram stream must combine to distinct (doc, bigram) pairs
    before the model join — partial aggregates present, no cartesian,
    no broadcast assumption on the model table required."""
    s = summarize(QUERIES["llm_ngram_lm_score"](spark, sf_dir))
    assert not s.has_cartesian
    plan = _plan(spark, sf_dir, "llm_ngram_lm_score")
    assert "partial" in plan.lower()


def test_curation_shardplan_source_gate_broadcasts(spark, sf_dir):
    """The surviving-source list is dimension-sized: the gate must
    re-attach as a broadcast semi join, not a corpus shuffle."""
    plan = _plan(spark, sf_dir, "llm_curation_shardplan")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_quantile_sketch_never_sorts_globally(spark, sf_dir):
    """The histogram quantile must not range-sort the fact: no
    rangepartitioning exchange anywhere in the plan (the only window
    runs on the 128-row bucket table)."""
    plan = _plan(spark, sf_dir, "agg_sketch_quantile")
    assert "rangepartitioning" not in plan, (
        "histogram quantile regressed to a global range sort:\n" + plan
    )
    assert "CartesianProduct" not in plan
    assert "SortAggregate" not in plan


def test_pagerank_iterations_never_cartesian(spark, sf_dir):
    # Three unrolled power iterations: every join is keyed (node/src/
    # text-hash) — a Cartesian anywhere would mean the rank update
    # degenerated to all-pairs.
    plan = _plan(spark, sf_dir, "llm_pagerank_sources")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_broadcasts_stats_and_takeordered(spark, sf_dir):
    # df/N/avgdl sides are term- or corpus-cardinality → broadcast;
    # the global top-10 must be TakeOrdered, not a full sort.
    plan = _plan(spark, sf_dir, "llm_bm25_search")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_url_dedup_is_single_aggregation(spark, sf_dir):
    # canonicalization is per-row codegen; the whole op is one
    # map-side-combined aggregate — exactly one shuffle.
    s = summarize(QUERIES["llm_dedup_url"](spark, sf_dir))
    assert s.n_exchanges <= 1, s.n_exchanges


def test_recursive_cte_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_recursive_cte")
    assert "CartesianProduct" not in plan


def test_substring_dedup_single_corpus_explode(spark, sf_dir):
    # ExactSubstr shape: the corpus must be shingled ONCE — the
    # global occurrence count comes from a window over the reduced
    # (doc, shingle) pair set, never a second scan+explode+join-back.
    plan = _plan(spark, sf_dir, "llm_substring_dedup")
    assert plan.count(") Generate") == 1, plan  # one detail header = one explode
    s = summarize(QUERIES["llm_substring_dedup"](spark, sf_dir))
    assert s.n_exchanges <= 3, s.n_exchanges


def test_incremental_dedup_never_broadcasts_the_store(spark, sf_dir):
    """The incremental-dedup contract: the corpus-sized signature
    store may reach a BroadcastExchange only AFTER the LSH candidate
    join has bounded it to candidate-sized rows. Broadcasting the raw
    store (its band explosion, or its signatures into the verify
    join) is the 100 TB failure mode. Concretely: every broadcast
    subtree whose lineage includes the store scan must contain the
    band-key join; and the band join's build side must be the
    store-free batch probe."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from delta_lake_play_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signature_table,
    )
    from delta_lake_play_spark.plans import broadcast_subtrees, executed_plan
    from delta_lake_play_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # short path: Spark truncates long scan locations out of plan
    # strings, which would make the marker checks below vacuous
    root = tempfile.mkdtemp(prefix="sigmk_")
    try:
        store_path = root + "/SIGSTORE_MARKER"
        minhash_signature_table(
            d.filter(F.col("doc_id") % 3 != 0), "doc_id", "text"
        ).write.parquet(store_path)
        store = spark.read.parquet(store_path)
        pairs, _ = incremental_minhash_dedup(
            store, d.filter(F.col("doc_id") % 3 == 0), "doc_id", "text", 0.75
        )
        assert "SIGSTORE_MARKER" in executed_plan(pairs)  # non-vacuous
        subtrees = broadcast_subtrees(pairs)
        assert subtrees, "batch-side broadcasts expected in the plan"
        assert any("SIGSTORE_MARKER" not in s for s in subtrees), (
            "no store-free broadcast found — the batch probe should be one"
        )
        for sub in subtrees:
            if "SIGSTORE_MARKER" in sub:
                assert "band_val" in sub, (
                    "store broadcast without LSH candidate bounding:\n" + sub
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_dpp_prunes_fact_scan(spark, sf_dir):
    # The fact scan must carry a dynamicpruningexpression in its
    # PartitionFilters — directory pruning driven by the dim side's
    # runtime filter result, reusing the dim broadcast.
    from delta_lake_play_spark.queries.runtime_filters import dpp_join_df

    plan = formatted_plan(dpp_join_df(spark, sf_dir))
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filters_fact_before_shuffle(spark, sf_dir):
    # With broadcast off (the 100 TB shuffle-join shape), the filtered
    # orders side must build a bloom_filter_agg and the lineitem side
    # must probe it (might_contain) below the exchange.
    from delta_lake_play_spark.queries.runtime_filters import (
        _BLOOM_CONFS,
        bloom_join_df,
    )

    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        plan = formatted_plan(bloom_join_df(spark, sf_dir))
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    low = plan.lower()
    assert "bloom_filter_agg" in low, plan[:2000]
    assert "might_contain" in low, plan[:2000]


def test_aggregate_pushdown_reaches_parquet_footer(spark, sf_dir):
    # MIN/MAX/COUNT must be answered by the scan (PushedAggregation),
    # not by reading data pages.
    from delta_lake_play_spark.queries.runtime_filters import (
        _AGG_PUSH_CONFS,
        agg_pushdown_df,
    )

    prev = {k: spark.conf.get(k, None) for k in _AGG_PUSH_CONFS}
    for k, v in _AGG_PUSH_CONFS.items():
        spark.conf.set(k, v)
    try:
        plan = formatted_plan(agg_pushdown_df(spark, sf_dir))
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    assert "PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]" in plan, (
        plan[:2000]
    )


def test_ohlc_single_exchange(spark, sf_dir):
    # open/close row_numbers partition by the SAME keys the final
    # aggregation groups on: one hash exchange serves both.
    s = summarize(QUERIES["win_resample_ohlc"](spark, sf_dir))
    assert s.n_exchanges == 1
    assert s.n_single_exchanges == 0


def test_ewma_zscore_keyed_windows_only(spark, sf_dir):
    # Bounded trailing frames over user-keyed windows — no global
    # (single-partition) window may appear at any scale.
    for key in ("win_ewma", "win_anomaly_zscore"):
        s = summarize(QUERIES[key](spark, sf_dir))
        assert s.n_single_exchanges == 0, key


def test_fuzzy_join_is_blocked_not_cartesian(spark, sf_dir):
    """The blocked fuzzy join must be an equi-join on the block key
    (hash or broadcast), never CartesianProduct / BroadcastNestedLoop
    — the whole point of blocking is that the edit-distance verify
    runs only inside block collisions."""
    plan = _plan(spark, sf_dir, "join_fuzzy_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "levenshtein" in plan  # verify stays post-join, in-block


def test_optimize_where_prunes_without_data_read(spark):
    """Partition-scoped OPTIMIZE decides its file scope from hive
    partition VALUES alone: the pruning step reads zero data files
    (pinned indirectly — the rewrite touches only in-scope files;
    see test_versioned_table.py::test_optimize_where_scopes_to_
    partition). Here: the rewritten partition's one output file
    carries partition-value stats so later reads keep pruning."""
    from pyspark.sql import functions as F

    from delta_lake_play_spark.table.versioned import (
        VersionedTable,
        temp_table_path,
    )

    df = spark.range(0, 90).withColumn("day", (F.col("id") % 3).cast("int"))
    t = VersionedTable.create(
        spark, temp_table_path("optw-plan"), df.repartition(3), partition_by=["day"]
    )
    t.optimize(target_files=1, where="day = 1")
    e = t._read_log(t.latest_version())
    rewritten = [f for f in e["files"] if "day=1" in f["path"]]
    assert len(rewritten) == 1
    assert rewritten[0]["stats"].get("day") == [1, 1]


def test_sql_udf_inlined_not_black_box(spark, sf_dir):
    """SQL UDFs must be parse-level rewrites: the executed plan shows
    the inlined CASE expression and a broadcast of the table-UDF
    dimension — never a ScalaUDF/PythonUDF callsite that would block
    codegen and pushdown at scale."""
    plan = _plan(spark, sf_dir, "sql_udf_create")
    assert "ScalaUDF" not in plan and "PythonUDF" not in plan
    assert "CASE WHEN" in plan
    assert "BroadcastExchange" in plan


def test_knn_join_no_cartesian_and_prunes_scan(spark, sf_dir):
    """The k-NN join must stay a keyed (bucket, salt) join — never a
    CartesianProduct — and its scan must not read columns the join
    does not use (label is not carried in the plain knn key)."""
    plan = _plan(spark, sf_dir, "llm_knn_join")
    assert "CartesianProduct" not in plan
    s = summarize(QUERIES["llm_knn_join"](spark, sf_dir))
    assert all("label" not in r for r in s.read_schemas)


def test_classifier_train_single_scan_per_iteration(spark, sf_dir):
    """Each GD iteration is ONE aggregate over the cached feature
    pass; nothing in the plan joins the corpus to itself."""
    plan = _plan(spark, sf_dir, "llm_quality_classifier_train")
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    )
    # the weight relation rides as a 1-row broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bitmap_distinct_avoids_expand(spark, sf_dir):
    """agg_bitmap_distinct's claim: exact distinct WITHOUT the
    count-distinct Expand rewrite — two hash aggregates over bounded
    bitmap state, both with map-side partial merge, and the scan
    pruned to the two columns involved."""
    plan = _plan(spark, sf_dir, "agg_bitmap_distinct")
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial+final
    assert "o_orderpriority" in plan and "o_custkey" in plan
    assert "o_totalprice" not in plan  # column pruning reached the scan


@pytest.mark.parametrize(
    "key", ["llm_ngram_novelty", "llm_repetition_filter", "llm_ngram_lm_score"]
)
def test_hashed_bigram_relation_shape(spark, sf_dir, key):
    """The three bigram keys share llm/ngrams.py::doc_bigram_hashes
    (r11, map-side since the optimization round): ONE parquet scan
    of documents feeding a narrow per-doc transform+explode — no
    vocabulary join, no window lead, so NO exchange (and no Sort)
    sits below the consumer's first aggregate — and every downstream
    exchange keys on the int64 bigram hash: the shuffled `bigram`
    attribute must be bigint (#..L), never a string (r10 sf1:
    28-38 s/key shuffling ~40-byte strings; r11: ~5 s)."""
    plan = _plan(spark, sf_dir, key)
    s = summarize(QUERIES[key](spark, sf_dir))
    assert not s.has_cartesian
    assert len(s.read_schemas) == 1, f"{key} must scan only documents"
    # the old shape's window-lead chain ordered by the posexplode
    # position; map-side chaining has no position attribute anywhere
    assert "pos#" not in plan, "bigram chain must be map-side, not lead(pos)"
    import re

    # ALL key columns of every exchange, not just the first (a
    # compound hashpartitioning(doc_id, bigram) must not hide a
    # string-typed bigram in second position — self-review r11)
    ex_keys = [
        kv
        for grp in re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        for kv in re.findall(r"(\w+)#\d+(L?)", grp)
    ]
    assert ("bigram", "") not in ex_keys, "bigram shuffled as non-long"
    if key == "llm_repetition_filter":
        # every statistic is within one document, so the whole key is
        # computed map-side over the per-doc sorted bigram array:
        # scan → (conditional fan_out exchange on a narrow local
        # input — functions/fanout.py) → project. Never an aggregate
        # or join exchange.
        assert s.n_exchanges <= 1, f"repetition must be map-side: {ex_keys}"
        assert "Join" not in plan and "HashAggregate" not in plan
    else:
        assert ("bigram", "L") in ex_keys, (
            f"no exchange keyed on int64 bigram in {key}: {ex_keys}"
        )
    if key == "llm_ngram_lm_score":
        # model frequency attaches as a window over the bigram
        # exchange, not a model-aggregate self-join that would re-run
        # the scan subtree for the build side (optimization r11).
        assert "Join" not in plan, "lm model must be a window, not a join"


@pytest.mark.parametrize(
    "key",
    [
        "llm_repetition_filter",      # llm/ngrams.py bigram relation
        "llm_ngram_lm_score",
        "llm_dedup_containment",      # queries/llm_dedup.py shingle chains
        "llm_decontaminate_bloom",    # queries/llm_text.py trigram chains
    ],
)
def test_char_hash_map_never_inlined(spark, sf_dir, key):
    """ADVICE r11 #1/#2: the per-doc token→hash lookup map
    (llm/minhash.py::char_hash_map) relies on an F.shuffle
    nondeterminism shield as the ONLY barrier stopping CollapseProject
    from inlining the map build into consumer lambdas; an inlined map
    re-evaluates per array element — re-hashing the whole document's
    vocabulary per token, the measured O(n²) trap (53 s vs 0.7 s at
    sf0.1). Version-fragile and invisible to row tests, so pin it in
    the plan: every map LOOKUP (element_at) must reference a
    materialized attribute, never an inline map_from_entries; and no
    indexed access may index into an inline-computed transform (the
    same quadratic re-evaluation for the shingle chains)."""
    plan = _plan(spark, sf_dir, key)
    assert "map_from_entries" in plan, (
        f"{key} no longer uses the lookup map — update or drop this test"
    )
    for line in plan.splitlines():
        if "element_at(" in line and "map_from_entries(" in line:
            raise AssertionError(
                f"{key}: lookup-map build inlined into its consumer "
                f"(O(n²) re-evaluation per element):\n{line[:400]}"
            )
        if "element_at(transform(" in line:
            raise AssertionError(
                f"{key}: indexed access into an inline-computed array "
                f"(O(n²) re-evaluation per index):\n{line[:400]}"
            )


def test_source_capping_single_scan(spark, sf_dir):
    # corpus scalars (total/n_sources/total_capped) as unpartitioned
    # window aggregates over the #sources-row aggregate, not
    # crossJoin'd broadcast aggregates (which re-scanned 4x).
    s = summarize(QUERIES["llm_source_capping"](spark, sf_dir))
    assert len(s.read_schemas) == 1, "capping must scan documents once"
    assert "Join" not in _plan(spark, sf_dir, "llm_source_capping")


@pytest.mark.slow
def test_no_cartesian_product_anywhere(spark, sf_dir):
    """Automated anti-pattern sweep (r10): NO registered pure-query
    key may plan a true CartesianProduct. The deliberate cross joins
    in the registry are all broadcast-bounded 1-row/k-row relations
    (weights, centroids, scalar stats) and plan as
    BroadcastNestedLoopJoin — an unbounded CartesianProduct sneaking
    in via a dropped join condition would pass a small-fixture
    correctness check and detonate at scale. Table-building and
    stream-running keys are excluded (their query functions execute
    commits as a side effect; their plan shapes are pinned by their
    own tests)."""
    skip_prefix = (
        "dml_",
        "stream_",
        "serve_",
        "sink_",
        "write_",
        "create_if",
        "time_travel",
        "set_except",
        "scan_latest",
        "history_scan",
    )
    skip_exact = {
        "llm_dedup_streaming",
        "llm_dedup_incremental",
        "llm_pipeline_end2end",
        # the ONE declared cartesian: bounded region × nation grid
        # (its docstring declares the intent; everything else must
        # carry an explicit broadcast hint or a join condition)
        "join_cross_small",
    }
    # auto-broadcast DISABLED for the sweep: at fixture scale every
    # relation fits the 10 MB threshold, so a dropped join condition
    # would plan as BroadcastNestedLoopJoin and the sweep would be
    # vacuous (self-review r10). With the threshold off, only
    # F.broadcast-HINTED bounded cross joins stay BNLJ — an unhinted
    # conditionless join surfaces as the CartesianProduct this
    # asserts against.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    offenders, checked = [], 0
    try:
        for key, fn in QUERIES.items():
            if key.startswith(skip_prefix) or key in skip_exact:
                continue
            plan = formatted_plan(fn(spark, sf_dir))
            checked += 1
            if "CartesianProduct" in plan:
                offenders.append(key)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert checked > 200, f"sweep shrank unexpectedly: {checked} keys"
    assert not offenders, f"true cartesian products in: {offenders}"


def test_phash_dedup_single_fingerprint_exchange(spark, sf_dir):
    # decode+hash is a zero-shuffle map stage; the ONLY exchange in
    # the plan is the window's hashpartitioning on the fingerprint.
    plan = _plan(spark, sf_dir, "llm_image_dedup_phash")
    assert "MapInPandas" in plan
    assert "hashpartitioning(dhash" in plan
    assert plan.count("hashpartitioning(") == 1, plan


def test_containment_vocab_broadcasts(spark, sf_dir):
    # token→hash signing joins through a broadcast vocabulary; the
    # inverted-index self-join shuffles on the int64 shingle key.
    plan = _plan(spark, sf_dir, "llm_dedup_containment")
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(t#" in plan or "hashpartitioning(t," in plan


def test_collocation_topk_joins_back_broadcast(spark, sf_dir):
    # the K-row top list must broadcast against the vocabulary —
    # never the other way around.
    plan = _plan(spark, sf_dir, "llm_collocation_lift")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-K is not a global sort


def test_audio_energy_is_pure_map(spark, sf_dir):
    # PCM feature extraction must not shuffle at all.
    plan = _plan(spark, sf_dir, "llm_multimodal_audio_energy")
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan


def test_weighted_median_windows_are_partitioned(spark, sf_dir):
    # cumulative-weight window partitions by group — a
    # single-partition window would serialize the whole table.
    plan = _plan(spark, sf_dir, "agg_weighted_median")
    assert "SinglePartition" not in plan, plan
