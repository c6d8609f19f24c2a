"""Drive every registered query against its DuckDB oracle — a local
replica of the driver's t2 correctness gate (at sf0.001 for speed;
the driver runs sf0.01)."""

import pytest

from delta_lake_play_spark.registry import all_oracles, all_queries

from .parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(key, spark, duck, sf_dir):
    spark_pdf = QUERIES[key](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLES[key]).fetchdf()
    compare(spark_pdf, duck_pdf, key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(key, spark, sf_dir):
    """Rows-only keys (no oracle): must run and return >0 rows."""
    df = QUERIES[key](spark, sf_dir)
    assert df.count() > 0, f"{key}: returned no rows"
