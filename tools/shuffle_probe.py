"""Measure ACTUAL shuffle traffic for registry queries: run each query
into the noop sink and report total shuffle-write records/bytes summed
over every executed stage (StatusTracker stage metrics), min wall time.

Usage: python tools/shuffle_probe.py [-n 3] name [name ...]

The honest runtime companion to plan dumps: an Exchange node in the
initial plan may be elided (or introduced) by AQE at runtime; shuffle
RECORDS actually written do not lie, and unlike wall time they are
load-insensitive and deterministic for a fixed plan + data.
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
    n_runs = 2
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
    spark = get_spark(app_name="qopcfdr-shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = all_queries()

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

    def store_totals():
        """(records, bytes, n_stages) summed over every stage the app has
        run so far — per-run numbers are before/after deltas."""
        store = sc._jsc.sc().statusStore()
        jvm = sc._jvm
        empty = jvm.java.util.ArrayList()  # empty status/task filters = all
        quantiles = sc._gateway.new_array(jvm.double, 0)
        it = store.stageList(empty, False, False, quantiles, jvm.java.util.ArrayList()).iterator()
        tot_rec = tot_bytes = n = 0
        while it.hasNext():
            s = it.next()
            tot_rec += s.shuffleWriteRecords()
            tot_bytes += s.shuffleWriteBytes()
            n += 1
        return tot_rec, tot_bytes, n

    out = {}
    for name in names:
        fn, _sql = qs[name]
        best = None
        deltas = []
        for _ in range(n_runs):
            df = fn(spark, sf_dir)
            r0, b0, s0 = store_totals()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            time.sleep(0.3)  # let the status store drain its event queue
            r1, b1, s1 = store_totals()
            best = dt if best is None else min(best, dt)
            deltas.append((r1 - r0, b1 - b0, s1 - s0))
            spark.catalog.clearCache()
        last = deltas[-1]  # steady-state run (artifacts/caches warm)
        out[name] = {
            "best_wall": round(best, 4),
            "shuffle_records": last[0],
            "shuffle_bytes": last[1],
            "stages": last[2],
            "all_runs": deltas,
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
