"""Every registry query hash-matches its DuckDB oracle at sf0.001 (the
driver re-runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
    all_queries,
)

from .oracle_util import compare, duckdb_conn

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    fn, sql = QUERIES[name]
    df = fn(spark, sf_dir)
    assert df is not None
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    problems = compare(df, con, sql)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert set(e.oracle_sql()) <= set(e.queries())
