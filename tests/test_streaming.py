"""Structured Streaming driver: same normalizers, foreachBatch fan-out,
availableNow catch-up trigger (SURVEY.md §3.1 / Phase 3)."""

from __future__ import annotations

import pytest

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming import (
    run_stream,
)

from .fdr_fixtures import EXPECTED_COUNTS, write_fixture_files


@pytest.mark.parametrize("max_files", [1])
def test_stream_availablenow(spark, tmp_path, max_files):
    src = write_fixture_files(str(tmp_path / "raw"))
    out = str(tmp_path / "ocsf")
    q = run_stream(
        spark,
        src,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=max_files,  # forces multiple micro-batches
    )
    q.awaitTermination(300)
    assert not q.isActive
    for key, expected in EXPECTED_COUNTS.items():
        n = spark.read.parquet(f"{out}/{key}").count()
        assert n == expected, f"{key}: {n} != {expected}"
    # restart with no new files -> no duplicates (checkpointed exactly-once)
    q2 = run_stream(spark, src, out, checkpoint=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    n = spark.read.parquet(f"{out}/process_activity").count()
    assert n == EXPECTED_COUNTS["process_activity"]
