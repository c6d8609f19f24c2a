"""Short/empty/NULL-document edge cases (ADVICE r3).

The driver regenerates fixtures per round and the fixture contract
does NOT guarantee a token minimum. Spark's ``sequence(a, b)``
DESCENDS when a > b (and raises for an explicit positive step), where
DuckDB's ``generate_series`` is empty — so a 1-token or empty doc
used to either crash (``element_at(toks, 0)``) or emit phantom
chunks. These tests run every sequence-generating text query against
its DuckDB oracle on a corpus built ONLY of degenerate documents.
"""

import os

import duckdb
import pandas as pd
import pytest

from delta_lake_play_spark.registry import all_oracles, all_queries

from .parity import compare

# Every oracle-paired registry key that reads ONLY the documents
# table (discovered by source scan) — the full surface a degenerate
# fixture regeneration could break.
SEQ_KEYS = [
    "sink_partitioned_parquet", "llm_pipeline_end2end", "llm_bm25_search",
    "llm_line_dedup", "llm_dedup_ngram_jaccard", "llm_mad_outlier_filter",
    "llm_leakage_report", "llm_ngram_lm_score", "llm_context_chunking",
    "udf_arrow_batch", "llm_pack_sequences", "llm_train_val_split",
    "llm_global_shuffle", "llm_domain_filter", "llm_curation_shardplan",
    "llm_importance_resample", "llm_dedup_fingerprint", "llm_dedup_url",
    "llm_tfidf_topterms", "llm_token_rarity", "llm_text_fingerprint",
    "llm_text_token_bpe", "llm_pii_redact", "llm_repetition_filter",
    "llm_quality_score_linear", "llm_quality_classifier_train",
    "llm_classifier_eval", "llm_source_overlap",
    "sample_data_mix", "sample_token_budget_mix",
    "udtf_python_offsets",
    "fn_explode_outer", "fn_posexplode", "llm_dedup_exact",
    "llm_dedup_near_minhash", "llm_dedup_cross_corpus",
    "llm_dedup_simhash", "llm_text_stats",
    "llm_doc_quality_filter", "llm_decontaminate", "fn_string_split_tokens",
    "fn_explode", "sink_text_roundtrip", "udtf_explode_ngrams",
]

_EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars) — all degenerate shapes
    (1, "solo", "en", "web", 4),  # 1 token: bigrams must be empty
    (2, "", "en", "web", 0),  # empty text: 0 chunks, 0 windows
    (3, None, "en", "web", 0),  # NULL text
    (4, "two tokens", "en", "web", 10),  # exactly one bigram
    (5, "   ", "en", "wiki", 3),  # whitespace-only → 0 real tokens
    # one normal doc so aggregates/joins have something to match on
    (6, "the quick brown fox jumps over the lazy dog again and again "
        * 3, "en", "wiki", 183),
    (0, "seed doc shared tokens the quick brown fox", "en", "web", 43),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_docs")
    pdf = pd.DataFrame(
        _EDGE_DOCS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sdf = spark.createDataFrame(
        pdf, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(str(d / "_docs"))
    part = next(
        f for f in os.listdir(d / "_docs") if f.endswith(".parquet")
    )
    os.rename(d / "_docs" / part, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("key", SEQ_KEYS)
def test_sequence_queries_survive_degenerate_docs(key, spark, edge_dir, edge_duck):
    """Must not crash, and must agree with the oracle row-for-row
    (both engines may legitimately emit zero rows for some keys —
    zero-vs-zero is agreement here, unlike the main parity gate)."""
    spark_pdf = all_queries()[key](spark, edge_dir).toPandas()
    duck_pdf = edge_duck.execute(all_oracles()[key]).fetchdf()
    if len(spark_pdf) == 0 and len(duck_pdf) == 0:
        return
    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    compare(spark_pdf, duck_pdf, key)
