"""Dump the POST-EXECUTION adaptive plan for registry queries.

Usage: python tools/plan_dump_final.py <tag> [--suffix s] name [name ...]

Companion to plan_dump.py: that tool prints the INITIAL plan
(`isFinalPlan=false`), which cannot show what AQE does at runtime —
reused exchanges, elided ENSURE_REQUIREMENTS shuffles over caches whose
partitioning only becomes visible once materialized, broadcast
promotions.  This one executes the query into the noop sink first and
then dumps ``executedPlan`` (the re-optimized final form), which is the
honest evidence for runtime-only plan claims (the r9 phrase-mining
lesson: "AQE reuses it at runtime" needs a dump that shows the reuse).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_final"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = "_" + args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:]

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
        all_queries,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="qopcfdr-plan-dump-final")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    for name in names:
        fn, _sql = qs[name]
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {ex}"
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
