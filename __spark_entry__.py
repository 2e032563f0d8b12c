"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator with its DuckDB oracle
(see SURVEY.md §2 and the package registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
    driver_queries,
)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        q3_shipping_priority,
    )

    return q3_shipping_priority(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Curated to 50 entries: the round driver's correctness harness records
    at most 50, so structural duplicates are excluded
    (registry.STRUCTURAL_EXCLUDE) and the slots go to anchors +
    never-verified + oldest-green-first per the recorded verification
    history (verification.DRIVER_HISTORY); everything stays in
    ``registry.all_queries`` for tests, bench, and tools/driver_sim.py."""
    return {name: fn for name, (fn, _sql) in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for non-SQL ops)."""
    return {
        name: sql
        for name, (_fn, sql) in driver_queries().items()
        if sql is not None
    }
