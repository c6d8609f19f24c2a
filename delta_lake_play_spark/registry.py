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
    # --- ROUND-8 WINDOW (first 50). Composition (SURVEY §15 records
    # the rationale): slots 1-11 enforce the new standing rule from
    # VERDICT r7 ask #1 — any key whose query source or reachable
    # operator changed in-round gets a window slot THAT round.
    # 1-4: the four keys whose r7 code change never got a driver row
    # (the ANSI-overflow DOUBLE-combination fix in the exact moment
    # aggregates; the IVF cell-count cap and its recall consumer).
    # 5-8: this round's composite-blocking change to blocked_pairs
    # (llm_dedup_embedding_cosine re-pointed per ask #3, plus the two
    # other blocked_pairs consumers whose single-key path is pinned
    # identical but reaches changed code) and the new dml_cluster_by
    # key (ask #6). 9-11: the delta_log.py changes (incremental crc,
    # sidecar GC grace, widest-span selection) through the three
    # mirror keys that observe those exact paths. Slots 12-50 rotate
    # the stale-evidence tail (ask #2), stalest first: all 5
    # remaining r1-vintage rows, then 34 r2-vintage rows — streams,
    # UDFs, windows, LLM singles and fn batteries before trivia.
    "agg_stddev_exact",
    "agg_corr_exact",
    "llm_similarity_ivf",
    "llm_ann_recall",
    "llm_dedup_embedding_cosine",
    "llm_dedup_clusters",
    "llm_dedup_keep_best",
    "dml_cluster_by",
    "dml_append_only",
    "dml_dv_native_protocol",
    "dml_checkpoint_v2",
    "dml_log_cleanup",
    "dml_log_compaction",
    # r8 sf1-anchor catch: the unbounded recursion tripped Spark's
    # 1M-row guardrail at 150k customers — seed now bounded by
    # construction; changed code -> window slot
    "sql_recursive_cte",
    # late r8 addition: near-dup-cluster-aware train/val/test split
    "llm_split_leakage_safe",
    # r8 continuation: the large×large blocked k-NN join and its
    # hard-negative-mining consumer (operators/similarity.py knn_join
    # + the generalized _sign_bucket_ctes oracle fragment) — new code,
    # window slots this round per the standing rule
    "llm_knn_join",
    "llm_hard_negatives",
    "llm_source_overlap",
    "sql_udf_create",
    "dml_vacuum_protocol_check",
    "llm_quality_classifier_train",
    "llm_classifier_eval",
    "stream_static_enrich",
    "llm_dedup_cross_corpus",
    "llm_knn_recall",
    "llm_matryoshka_recall",
    "dml_checkpoint_multipart",
    "dml_update_mor",
    # r1-vintage stale rows (newest driver evidence: round 1)
    "agg_max_by_min_by",
    "agg_pivot",
    "filter_null_safe_eq",
    "join_salted_skew",
    "sample_hash_mod",
    # r2-vintage stale rows — stateful/complex machinery first
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_stateful",
    "udf_python_scalar",
    "udf_pandas_vectorized",
    "udaf_pandas_grouped",
    "udtf_explode_ngrams",
    "llm_dedup_exact",
    "llm_dedup_near_minhash",
    "llm_dedup_simhash",
    "llm_similarity_topk",
    "llm_text_stats",
    "llm_doc_quality_filter",
    "llm_multimodal_cols",
    "win_row_number_topk_per_group",
    # --- TIER 2 (51+): the r2-vintage rows deferred to r9 — trivial
    # scan/sort/set/map/HOF machinery, least likely to rot (fn_explode,
    # fn_map_json, fn_array_hof, fn_array_ops displaced by the
    # late-registered dml_append_only / dml_dv_native_protocol /
    # llm_split_leakage_safe keys and the sql_recursive_cte re-proof:
    # new/changed machinery gets driver validation first, the
    # endorsed trade; fn_string_split_tokens / fn_string_regex /
    # fn_date_trunc_extract / fn_date_arith / fn_timestamp_cast_fmt
    # joined this tier when the r8-continuation knn-join /
    # hard-negatives / source-overlap / sql-udf / vacuum-protocol
    # keys took slots; fn_string_basic / agg_grouping_sets for the
    # classifier trainer + eval pair; win_session_id for the
    # stream-static join; win_ntile for cross-corpus dedup;
    # win_range_frame_moving_avg for the knn recall harness;
    # win_running_sum_frame for the matryoshka recall;
    # win_lag_lead_delta for the multi-part checkpoint key;
    # win_rank_dense_rank for the MoR update).
    "win_rank_dense_rank",
    "win_lag_lead_delta",
    "win_running_sum_frame",
    "win_range_frame_moving_avg",
    "win_ntile",
    "win_session_id",
    "agg_grouping_sets",
    "fn_string_basic",
    "fn_string_split_tokens",
    "fn_string_regex",
    "fn_date_trunc_extract",
    "fn_date_arith",
    "fn_timestamp_cast_fmt",
    "fn_array_ops",
    "fn_array_hof",
    "fn_explode",
    "fn_map_json",
    "fn_cond_case",
    "json_column_parse",
    "collect_to_pandas",
    "create_dataframe_rows",
    "sort_by_key",
    "sort_multi_col_nulls",
    "limit_n",
    "topk_global",
    "set_union_all",
    "set_intersect",
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
