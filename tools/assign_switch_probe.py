"""Cell-assignment switch-point probe: literal-argmin vs broadcast
centroid-table join at growing K over a fixed synthetic corpus.

The literal form compiles K dot products into the plan (whole-stage
codegen, zero shuffle) — unbeatable at small K but linear in K per row
AND in codegen size.  The join form (``assign_cells_join``) crossJoins a
broadcast K-row centroid table and reduces with min — per-row cost flat
in K (one struct-min over the broadcast build side).  This probe
documents where the curves cross, justifying ASSIGN_JOIN_MIN_CELLS:
``assign_cells`` dispatches literal below that K, join at or above.

Usage: python tools/assign_switch_probe.py [N] [runs]
Prints one JSON line per K with both forms' best seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ann_scale_probe import synthetic_vecs  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _nearest_cell,
        assign_cells_join,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark()
    path = f"/tmp/assign_probe_corpus_{n}"
    synthetic_vecs(spark, n).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    results = []
    for k in (64, 128, 256, 512, 1024):
        # centroids = first k unit vectors (assignment cost does not
        # depend on centroid quality, only on K)
        cents = [list(r["u"]) for r in emb.orderBy("vec_id").limit(k).collect()]

        def run_literal():
            return (
                emb.select(_nearest_cell(F.col("u"), cents).alias("cell"))
                .groupBy("cell")
                .count()
                .count()
            )

        def run_join():
            return (
                assign_cells_join(emb, cents)
                .groupBy("cell")
                .count()
                .count()
            )

        row = {"k": k, "n_vecs": n}
        for name, fn in (("literal_argmin", run_literal), ("broadcast_join", run_join)):
            fn()  # warmup: codegen JIT (the literal form's is K-sized!)
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[name] = round(best, 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
