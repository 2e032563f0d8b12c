"""Drive the FDR->OCSF pipeline end-to-end on synthetic gzip NDJSON:
write fixture objects, run the batch pipeline, register the lake, query
it with Spark SQL, and print per-sink counts.

Usage: python tools/pipeline_demo.py   (~1 min; uses a temp dir)
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from fdr_fixtures import EXPECTED_COUNTS, write_fixture_files

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.pipeline import (
        run_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.parquet import (
        register_ocsf_tables,
    )

    spark = get_spark(app_name="qopcfdr-demo")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="qopcfdr_demo_")
    src = write_fixture_files(os.path.join(base, "raw"))
    lake = os.path.join(base, "lake")
    run_batch(spark, src, lake)
    views = register_ocsf_tables(spark, lake)

    bad = 0
    for key, expected in sorted(EXPECTED_COUNTS.items()):
        n = spark.sql(f"SELECT count(*) AS n FROM {key}").collect()[0].n
        ok = n == expected
        bad += 0 if ok else 1
        print(f"{key}: {n} rows {'OK' if ok else f'!= expected {expected}'}")
    total = spark.sql(
        "SELECT class_name, count(*) AS n FROM ocsf_all GROUP BY 1 ORDER BY 1"
    )
    total.show(20, truncate=False)
    print(f"views registered: {len(views)}; FAILS: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
