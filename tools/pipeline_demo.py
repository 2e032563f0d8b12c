"""End-to-end FDR->OCSF pipeline demo, driven the way a user would:

1. writes synthetic gzip NDJSON FDR objects into a temp 'bucket' dir,
2. runs the batch pipeline (classify -> 13 normalizers -> partitioned
   GZIP parquet + quarantine),
3. registers the sinks and runs Spark SQL over them (the Athena
   replacement), printing per-class counts and a sample query.

Usage: python tools/pipeline_demo.py [--stream]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from fdr_fixtures import write_fixture_files

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.pipeline import (
        run_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.parquet import (
        register_ocsf_tables,
    )

    spark = get_spark(app_name="qopcfdr-pipeline-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="qopcfdr-demo-")
    src = write_fixture_files(os.path.join(tmp, "raw"))
    out = os.path.join(tmp, "lake")

    if "--stream" in sys.argv:
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming import (
            run_stream,
        )

        q = run_stream(spark, src, out, checkpoint=os.path.join(tmp, "ckpt"))
        q.awaitTermination(600)
    else:
        run_batch(spark, src, out, region="us-east-1", account_id="123456789012")

    tables = register_ocsf_tables(spark, out)
    print(f"lake at {out}; registered: {tables}")
    spark.sql(
        "SELECT class_name, count(*) AS n FROM ocsf_all GROUP BY class_name ORDER BY class_name"
    ).show(truncate=False)
    spark.sql(
        "SELECT metadata.log_name, device.os.type, process.cmd_line "
        "FROM process_activity WHERE eventDay = '20240610'"
    ).show(truncate=False)
    print("quarantine:",
          {d: spark.read.parquet(f"{out}/_quarantine/{d}").count()
           for d in ("corrupt_lines", "no_discriminator", "unmapped_events")})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
