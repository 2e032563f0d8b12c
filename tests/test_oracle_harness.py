"""The local oracle harness must be bit-faithful to the driver's
serialized value-hash: the sign of zero and NaN-vs-number must be
DISTINGUISHED, not collapsed by numeric ==.  Round 4 shipped
``embedding_project_rp`` red exactly because ``compare()`` said 0.0 ==
-0.0 while the driver's hash of the serialized values did not
(VERDICT r4 item #2 / ADVICE r4 medium)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_util import compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_compare_flags_negative_zero(spark, con):
    """+0.0 (Spark) vs -0.0 (DuckDB) must MISMATCH — this is the exact
    class the driver's value-hash sees and the r4 harness missed."""
    sp = spark.createDataFrame([(1, 0.0)], "id int, x double")
    sql = "SELECT 1 AS id, round(CAST(-0.00001 AS DOUBLE), 4) AS x"
    assert con.execute(sql).df()["x"].map(repr)[0] == "-0.0"
    assert compare(sp, con, sql), "compare() must distinguish -0.0 from +0.0"


def test_compare_accepts_equal_zero_and_nan(spark, con):
    sp = spark.createDataFrame(
        [(1, 0.0), (2, float("nan"))], "id int, x double"
    )
    sql = (
        "SELECT 1 AS id, 0.0::DOUBLE AS x "
        "UNION ALL SELECT 2, CAST('nan' AS DOUBLE)"
    )
    assert compare(sp, con, sql) == []


def test_spark_round_has_no_signed_zero(spark):
    """The sweep's contract: Spark's BigDecimal HALF_UP round NEVER
    emits -0.0, so normalizing the DuckDB side with `+ 0.0` makes both
    engines agree.  If a Spark upgrade changes this, every rounded
    negative-capable oracle column needs the Spark-side `+ 0.0` too."""
    row = (
        spark.range(1)
        .select(
            F.round(F.lit(-0.00001), 4).alias("a"),
            F.round(F.lit(-0.0), 4).alias("b"),
            (F.round(F.lit(-0.00001), 4) + F.lit(0.0)).alias("c"),
        )
        .collect()[0]
    )
    assert repr(row.a) == "0.0"
    assert repr(row.b) == "0.0"
    assert repr(row.c) == "0.0"


def test_rp_projection_matches_oracle_at_zero_cells(spark, sf_dir, con2=None):
    """End-to-end pin of the r4 red row: embedding_project_rp vs its
    oracle under the hardened compare at sf0.001 (the r4 mismatch was
    3/4000 cells at sf0.01; any tiny-negative dot in this corpus now
    normalizes to +0.0 on both sides)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _rp_oracle_sql,
        embedding_project_rp,
    )
    from tests.oracle_util import duckdb_conn

    con = duckdb_conn(sf_dir)
    assert compare(embedding_project_rp(spark, sf_dir), con, _rp_oracle_sql()) == []
