"""Judged query inventory — importing this package registers every
implemented operator from SURVEY.md §2 into the registry."""

from delta_lake_play_spark.queries import (  # noqa: F401
    aggregates,
    dml_queries,
    filters,
    flagship,
    graphs,
    joins,
    llm_bpe,
    llm_compose,
    llm_dedup,
    llm_multimodal,
    llm_pq,
    llm_similarity,
    llm_text,
    runtime_filters,
    scalar_functions,
    scans,
    serving_queries,
    sorts_sets,
    streaming_queries,
    subqueries,
    tpch_extra,
    udfs,
    windows,
)
