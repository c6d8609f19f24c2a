"""t1 replica: entry(spark) runs and returns rows with a stable schema."""

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]


def test_every_query_has_callable(spark):
    qs = entry_mod.queries()
    assert "agg_group_sum_avg_count" in qs
    for k, fn in qs.items():
        assert callable(fn), k


def test_oracles_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
