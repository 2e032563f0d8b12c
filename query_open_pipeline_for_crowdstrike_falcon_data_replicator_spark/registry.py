"""Central registry of every (query builder, oracle SQL) pair the engine
exposes through ``__spark_entry__``.

Each builder is ``(spark, sf_dir) -> DataFrame``; the oracle is equivalent
DuckDB SQL over the same parquet tables (or ``None`` for ops whose semantics
are not SQL-expressible — those get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Driver-visible queries that bench.py should not TIME: ocsf_etl_50k runs
# 29 jobs (13 partitioned writes + quarantines + read-backs) whose fixed
# orchestration overhead (~10s regardless of rows at local scale) would
# swamp the per-query timings; its correctness still runs every round and
# the write path is exercised by tests/test_pipeline.py.
BENCH_EXCLUDE = {"ocsf_etl_50k"}


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from .plans.relational import RELATIONAL_QUERIES

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    merged.update(RELATIONAL_QUERIES)

    try:
        from .plans.tpch_extra import TPCH_EXTRA_QUERIES

        merged.update(TPCH_EXTRA_QUERIES)
    except ImportError:
        pass

    try:
        from .operators.temporal import TEMPORAL_QUERIES

        merged.update(TEMPORAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.dedup import DEDUP_QUERIES

        merged.update(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.text import TEXT_QUERIES

        merged.update(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.similarity import SIMILARITY_QUERIES

        merged.update(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.multimodal import MULTIMODAL_QUERIES

        merged.update(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.ocsf_queries import OCSF_QUERIES

        merged.update(OCSF_QUERIES)
    except ImportError:
        pass
    return merged
