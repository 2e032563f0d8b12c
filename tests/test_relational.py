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


def test_quantiles_approx_vs_exact_yardstick(spark, sf_dir, con):
    """The registered quantile query is the approx (GK) form; the exact
    array-percentile stays here as its yardstick — first hash-matched
    against DuckDB's quantile_cont, then used to bound the approx form's
    value error (rank error <= 1e-4 at accuracy=10000; value tolerance
    below is the loose translation of that through this distribution)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        PROFILE_QUANTILES_SQL,
        profile_quantiles,
        profile_quantiles_approx,
    )

    exact_df = profile_quantiles(spark, sf_dir)
    problems = compare(exact_df, con, PROFILE_QUANTILES_SQL)
    assert not problems, f"exact yardstick vs DuckDB: {problems}"

    exact = {r["l_returnflag"]: r for r in exact_df.collect()}
    approx = {r["l_returnflag"]: r for r in profile_quantiles_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for flag, er in exact.items():
        ar = approx[flag]
        for col in ("p50_cents", "p90_cents", "p99_cents"):
            rel = abs(ar[col] - er[col]) / max(abs(er[col]), 1.0)
            assert rel <= 0.02, f"{flag}.{col}: exact={er[col]} approx={ar[col]} rel={rel:.4f}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert set(e.oracle_sql()) <= set(e.queries())
