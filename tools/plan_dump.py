"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [name ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix via --suffix, default
none -> "<query>.txt").  With no names, dumps every non-excluded
registry entry.  The tag is the round directory (e.g. r09); the
optimization deliverable commits before/after pairs from here.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = "_" + args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:]

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
        BENCH_EXCLUDE,
        all_queries,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="qopcfdr-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    targets = names or sorted(n for n in qs if n not in BENCH_EXCLUDE)
    for name in targets:
        fn, _sql = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {ex}"
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
    spark.stop()


if __name__ == "__main__":
    main()
