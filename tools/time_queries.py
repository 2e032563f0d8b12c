"""Time a subset of registry queries into the noop sink, min-of-N.

Usage: python tools/time_queries.py [-n 3] name [name ...]
Prints one JSON line {name: best_sec}.  Same methodology as bench.py
(noop sink, clearCache between runs) so numbers are comparable; use for
tight A/B loops on specific queries without paying for the full bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if "-n" in args:
        i = args.index("-n")
        n_runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
        all_queries,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qopcfdr-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # one warmup pass at the smallest SF (JIT/codegen amortization)
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name in names:
            try:
                qs[name][0](spark, warm).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    spark.catalog.clearCache()

    out: dict[str, float] = {}
    construct: dict[str, float] = {}
    for name in names:
        fn, _sql = qs[name]
        best = None
        cbest = None
        for _ in range(n_runs):
            c0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            cbest = (t0 - c0) if cbest is None else min(cbest, t0 - c0)
            spark.catalog.clearCache()
        out[name] = round(best, 4)
        construct[name] = round(cbest, 4)
    print(json.dumps({"timed": out, "construct": construct}))
    spark.stop()


if __name__ == "__main__":
    main()
