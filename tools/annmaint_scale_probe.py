"""Incremental ANN maintenance probe: per-batch ingest+serve latency as
the persisted cell-clustered index GROWS — the streamed path's 100 TB
question is not one batch's cost but whether batch k's cost stays flat
as the corpus behind the index accumulates.

Feeds B equal synthetic clustered-unit-vector batches (ascending
vec_id ranges, ann_scale_probe's generator) through
``annmaint.extend_ann_index`` against one persisted output, timing each
batch end-to-end (assign + fixed-query-set serve + both snapshot
commits).  The serve's corpus read prunes to the query set's probed
cells via the clustered snapshot's manifest stats, so the flatness
ratio last/first is the number that would expose a full-index-scan or
snapshot-append term that grows with corpus size.

Usage: python tools/annmaint_scale_probe.py [batch_vecs] [n_batches] [n_cells]
Prints one JSON line: {"batch_vecs": ..., "n_batches": ..., "n_cells":
..., "cores": ..., "batch_sec": [...], "last_over_first": ...,
"index_rows": ..., "serve_rows": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    batch_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from ann_scale_probe import synthetic_unit_vectors
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.annmaint import (
        INDEX_TABLE,
        SERVES_TABLE,
        extend_ann_index,
    )

    spark = get_spark()
    out = f"/tmp/annmaint_probe_{batch_vecs}x{n_batches}_{n_cells}"
    shutil.rmtree(out, ignore_errors=True)

    # one corpus, sliced into ascending vec_id batches (the module's
    # arrival-order precondition); written first so generation cost
    # never rides a batch timer
    corpus_path = f"/tmp/annmaint_probe_corpus_{batch_vecs * n_batches}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_unit_vectors(spark, batch_vecs * n_batches).select(
            "vec_id", F.col("u").cast("array<float>").alias("embedding")
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    walls = []
    for b in range(n_batches):
        lo, hi = b * batch_vecs, (b + 1) * batch_vecs
        batch = corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        t0 = time.monotonic()
        extend_ann_index(
            spark, batch, out, b, txn_app="ann-probe", n_cells=n_cells
        )
        walls.append(time.monotonic() - t0)

    index_rows = read_snapshot(spark, f"{out}/{INDEX_TABLE}").count()
    serve_rows = read_snapshot(spark, f"{out}/{SERVES_TABLE}").count()
    print(
        json.dumps(
            {
                "batch_vecs": batch_vecs,
                "n_batches": n_batches,
                "n_cells": n_cells,
                "cores": cpus,
                "batch_sec": [round(w, 2) for w in walls],
                # ratio from UNROUNDED walls: a sub-5 ms first batch would
                # round to 0.0 and divide-by-zero
                "last_over_first": (
                    round(walls[-1] / walls[0], 2) if walls[0] > 0 else None
                ),
                "index_rows": index_rows,
                "serve_rows": serve_rows,
            }
        )
    )


if __name__ == "__main__":
    main()


