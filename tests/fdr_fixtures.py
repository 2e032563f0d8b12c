"""Test-side helpers over the package's synthetic FDR sample events:
gzip NDJSON writer + expected per-table routing counts."""

from __future__ import annotations

import gzip
import json
import os

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.sample import (  # noqa: F401
    COMMON,
    FIXTURES,
    JA3,
    MD5,
    SHA1,
    SHA256,
    ev,
)

CORRUPT_LINE = "{not json at all"

# per-table expected row counts from the FIXTURES events
EXPECTED_COUNTS = {
    "process_activity": 2,
    "network_activity": 2,
    "device_config_state": 6,  # 2 + alt-disc + ts-variants(2) + empty-strings
    "http_activity": 4,
    "http_activity_extapi": 2,
    "file_system_activity": 2,
    "dns_activity": 1,
    "authentication": 1,
    "file_hosting_activity": 2,
    "module_activity": 2,
    "application_lifecycle": 2,
    "operating_system_patch_state": 2,
    "detection_finding": 1,
}


def write_fixture_files(dir_path: str, *, with_corrupt_file: bool = False) -> str:
    os.makedirs(dir_path, exist_ok=True)
    half = len(FIXTURES) // 2
    for i, chunk in enumerate((FIXTURES[:half], FIXTURES[half:])):
        lines = [json.dumps(e) for e in chunk]
        if i == 0:
            lines.append(CORRUPT_LINE)
        with gzip.open(os.path.join(dir_path, f"fdr_part{i}.gz"), "wt") as f:
            f.write("\n".join(lines) + "\n")
    if with_corrupt_file:
        with open(os.path.join(dir_path, "broken.gz"), "wb") as f:
            f.write(b"\x1f\x8b\x08\x00garbage-truncated")
    return dir_path
