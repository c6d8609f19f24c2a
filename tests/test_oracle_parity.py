"""Drive every registered query against its DuckDB oracle — a local
replica of the driver's t2 correctness gate (at sf0.001 for speed;
the driver runs sf0.01)."""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from delta_lake_play_spark.registry import all_oracles, all_queries

from .parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(key, spark, duck, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    # Registry lint (VERDICT r5 #1): a hash-checked key must never
    # expose array/map/struct columns — the driver's canonicalizer
    # (pandas sort_values) crashes on them (llm_embedding_quantize
    # ERR). Render complex values to deterministic strings instead.
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{key}: hash-checked output has complex-typed columns "
        f"{complex_cols} — the driver canonicalizer crashes on these; "
        "render to sorted-CSV strings (see queries/aggregates.py)"
    )
    spark_pdf = df.toPandas()
    duck_pdf = duck.execute(ORACLES[key]).fetchdf()
    compare(spark_pdf, duck_pdf, key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(key, spark, sf_dir):
    """Rows-only keys (no oracle): must run and return >0 rows."""
    df = QUERIES[key](spark, sf_dir)
    assert df.count() > 0, f"{key}: returned no rows"
