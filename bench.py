"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes its full physical plan into the noop sink (no driver
collection), so the number measures engine work: scan + shuffle + compute.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
        BENCH_EXCLUDE,
        all_queries,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="qopcfdr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = sorted(
        (n, v) for n, v in all_queries().items() if n not in BENCH_EXCLUDE
    )

    # Warmup at the smallest SF: amortizes one-time JVM/codegen costs so the
    # timed pass measures engine work, not JIT.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for _name, (fn, _sql) in qs:
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # drop caches the warmup pass persisted: queries must not inherit each
    # other's cached RDDs (cross-query interference skews per-query times)
    spark.catalog.clearCache()

    # box-speed canary: a fixed synthetic workload, data-independent and
    # code-independent of the engine, timed min-of-3.  Every round's
    # verdict re-discovers that bench totals are not comparable across
    # days (same-code A/B on this box has measured 33.3 s vs 40.2 s);
    # the canary turns that from an argument into a number — divide two
    # rounds' totals by their canaries before calling anything a
    # regression.  cpu: one whole-stage-codegen pipeline over
    # spark.range (no input, no shuffle); shuffle: the same rows
    # through one 200-key exchange + final aggregate.
    def _canary(df_builder) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df_builder().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    from pyspark.sql import functions as F

    canary = {
        "cpu_sec": _canary(
            lambda: spark.range(500_000_000).select(
                F.sum((F.col("id") * 2654435761) % 1000000007).alias("s")
            )
        ),
        "shuffle_sec": _canary(
            lambda: spark.range(20_000_000)
            .groupBy((F.col("id") % 200).alias("k"))
            .agg(F.sum("id").alias("s"))
            .groupBy()
            .agg(F.sum("s").alias("t"))
        ),
    }

    # min of 3 runs per query: a single run is hostage to transient
    # machine load (this box runs a round driver alongside; round 2 showed
    # 1.4-2.8x phantom regressions on untouched queries at min-of-2); the
    # minimum is the standard load-insensitive estimator for warm wall time
    #
    # r10 (additive, VERDICT r9 item 1): the CONSTRUCTION phase — the
    # fn(spark, sf_dir) call that builds the DataFrame — is timed
    # separately into the new "construct" map.  Builders that run real
    # Spark jobs before returning (eager cache fills like ppl_filter's
    # j.count(), the triplet forms' pairs.count(), first-use build_once
    # artifacts) are visible there instead of escaping the headline.
    # The "queries" map itself is UNCHANGED: same noop-sink action, same
    # min-of-3, same values as every earlier round.
    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    for name, (fn, _sql) in qs:
        best = None
        cbest = None
        for _ in range(3):
            c0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            cbest = (t0 - c0) if cbest is None else min(cbest, t0 - c0)
            spark.catalog.clearCache()
        timings[name] = round(best, 4)
        construct[name] = round(cbest, 4)

    # --slowest N (default 10): refine the heavy tail with 3 MORE runs
    # per query (min-of-6 total).  At 130 queries / ~42 s the per-query
    # floor is ~0.3 s of fixed job overhead, so round-over-round
    # regressions are only detectable on the heavy queries — this
    # section keeps them comparable above box variance.  The headline
    # total stays the single-pass min-of-3 (cross-round consistency);
    # compare slowest_min3 when chasing a specific query.
    n_slow = 10
    if "--slowest" in sys.argv:
        i = sys.argv.index("--slowest")
        nxt = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
        # lenient parse: a malformed operand must not discard a whole
        # completed min-of-3 pass
        n_slow = int(nxt) if nxt.lstrip("-").isdigit() else 10
    slowest_min3: dict[str, float] = {}
    if n_slow > 0:
        by_name = dict(qs)
        for name, best in sorted(
            timings.items(), key=lambda kv: kv[1], reverse=True
        )[:n_slow]:
            fn, _sql = by_name[name]
            for _ in range(3):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            slowest_min3[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    construct_total = round(sum(construct.values()), 4)
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "canary": canary,
        "construct": construct,
        "construct_total": construct_total,
        **({"slowest_min3": slowest_min3} if slowest_min3 else {}),
    }
    # Per-query detail FIRST, compact headline LAST: the round driver
    # tail-captures stdout, and at 90+ queries the detail line outgrew
    # its window in round 3 — printing the headline last guarantees the
    # total survives truncation.  The full JSON also lands in
    # BENCH_SELF.json for offline comparison.
    print(json.dumps(full))
    with open(os.path.join(REPO, "BENCH_SELF.json"), "w") as f:
        json.dump(full, f)
        f.write("\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "canary": canary,
                "construct_total": construct_total,
                "queries": slowest,
                "detail": "full per-query timings in BENCH_SELF.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
