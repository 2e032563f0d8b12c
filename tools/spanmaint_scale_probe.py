"""Incremental span-removal probe: per-batch cleaning latency as the
persisted window index GROWS — the streamed path's 100 TB question is
not one batch's cost but whether batch k's cost stays flat as the
corpus behind the index accumulates.

Feeds B equal synthetic batches (dedup_scale_probe's generator, shifted
doc_id ranges so cross-batch near-dups and shared boilerplate land in
every batch) through ``spanmaint.extend_span_clean`` against one
persisted output, timing each batch end-to-end (clean + both snapshot
commits).  Reports the per-batch wall series and the flatness ratio
last/first — the number that would expose an index-probe or
snapshot-append term that grows with corpus size.

Usage: python tools/spanmaint_scale_probe.py [batch_docs] [n_batches]
[compact_every]
A non-zero ``compact_every`` folds snapshot compaction in after every
N-th batch (streaming/compaction.compact_twin_tables, the
run_span_stream hook) and reports the live-file trajectory of the
window index plus each compaction's wall — the long-running-stream
evidence that the pruning index stays tight at bounded cost.
Prints one JSON line: {"batch_docs": ..., "n_batches": ..., "cores":
..., "batch_sec": [...], "last_over_first": ..., "index_windows": ...,
"total_removed": ..., "compact_every": ..., "live_files": [...],
"compact_sec": [...]}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from pyspark.sql import functions as F

    from dedup_scale_probe import synthetic_docs
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
        snapshot_files,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.compaction import (
        compact_twin_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        CLEAN_TABLE,
        WINDOWS_TABLE,
        extend_span_clean,
    )

    spark = get_spark()
    out = f"/tmp/spanmaint_probe_{batch_docs}x{n_batches}c{compact_every}"
    shutil.rmtree(out, ignore_errors=True)

    # one corpus, sliced into ascending doc_id batches (the module's
    # arrival-order precondition); written first so generation cost
    # never rides a batch timer
    corpus_path = f"/tmp/spanmaint_probe_corpus_{batch_docs * n_batches}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_docs(spark, batch_docs * n_batches).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    walls = []
    compact_walls = []
    live_files = []
    for b in range(n_batches):
        lo, hi = b * batch_docs, (b + 1) * batch_docs
        batch = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        t0 = time.monotonic()
        extend_span_clean(spark, batch, out, b, txn_app="span-probe")
        walls.append(time.monotonic() - t0)
        t1 = time.monotonic()
        if compact_twin_tables(
            spark,
            out,
            [CLEAN_TABLE, WINDOWS_TABLE],
            txn_app="span-probe",
            batch_id=b,
            canonical=WINDOWS_TABLE,
            compact_every=compact_every,
        ):
            compact_walls.append(round(time.monotonic() - t1, 2))
        live_files.append(len(snapshot_files(spark, f"{out}/{WINDOWS_TABLE}")))

    n_windows = read_snapshot(spark, f"{out}/{WINDOWS_TABLE}").count()
    removed = (
        read_snapshot(spark, f"{out}/{CLEAN_TABLE}")
        .agg(F.sum("n_removed"))
        .collect()[0][0]
    )
    print(
        json.dumps(
            {
                "batch_docs": batch_docs,
                "n_batches": n_batches,
                "cores": cpus,
                "batch_sec": [round(w, 2) for w in walls],
                # ratio from UNROUNDED walls, guarded: a sub-5 ms first
                # batch would round to 0.0 and divide-by-zero
                "last_over_first": (
                    round(walls[-1] / walls[0], 2) if walls[0] > 0 else None
                ),
                "index_windows": n_windows,
                "total_removed": int(removed),
                "compact_every": compact_every,
                "live_files": live_files,
                "compact_sec": compact_walls,
            }
        )
    )


if __name__ == "__main__":
    main()
