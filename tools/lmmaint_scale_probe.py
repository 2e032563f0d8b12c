"""Incremental LM-maintenance probe: per-batch maintain+serve latency
as the count-delta tables GROW — the streamed path's 100 TB question is
whether batch k's cost stays flat as the model behind the merge-on-read
serve accumulates, and what the fold compaction buys.

Feeds B equal synthetic batches (dedup_scale_probe's generator, shifted
doc_id ranges) through ``lmmaint.extend_lm`` against one persisted
output, timing each batch end-to-end (two delta commits + the
merge-on-read serve + the scores commit).  Without folding, every serve
re-reads every delta file ever appended for the probed keys; with
``compact_every`` (or a file-count trigger via ``max_files``) the count
tables periodically collapse to one row per n-gram, which is the claim
this probe measures.

Usage: python tools/lmmaint_scale_probe.py [batch_docs] [n_batches]
[compact_every] [max_files]
Prints one JSON line: {"batch_docs": ..., "n_batches": ..., "cores":
..., "batch_sec": [...], "last_over_first": ..., "bigram_rows": ...,
"scored_docs": ..., "compact_every": ..., "max_files": ...,
"live_files": [...], "compact_sec": [...]}
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
    max_files = int(sys.argv[4]) if len(sys.argv) > 4 else 0
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
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.lmmaint import (
        BIG_TABLE,
        SCORES_TABLE,
        UNI_TABLE,
        extend_lm,
        fold_bigrams,
        fold_unigrams,
    )

    spark = get_spark()
    out = (
        f"/tmp/lmmaint_probe_{batch_docs}x{n_batches}"
        f"c{compact_every}m{max_files}"
    )
    shutil.rmtree(out, ignore_errors=True)

    # one corpus, sliced into ascending doc_id batches; written first so
    # generation cost never rides a batch timer
    corpus_path = f"/tmp/lmmaint_probe_corpus_{batch_docs * n_batches}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_docs(spark, batch_docs * n_batches).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    walls: list[float] = []
    compact_walls: list[float] = []
    live_files: list[int] = []
    for b in range(n_batches):
        lo, hi = b * batch_docs, (b + 1) * batch_docs
        batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.monotonic()
        extend_lm(spark, batch, out, b, txn_app="lm-probe")
        walls.append(time.monotonic() - t0)
        t1 = time.monotonic()
        if compact_twin_tables(
            spark,
            out,
            [UNI_TABLE, BIG_TABLE],
            txn_app="lm-probe",
            batch_id=b,
            canonical=BIG_TABLE,
            compact_every=compact_every,
            max_live_files=max_files or None,
            transforms={UNI_TABLE: fold_unigrams, BIG_TABLE: fold_bigrams},
        ):
            compact_walls.append(round(time.monotonic() - t1, 2))
        live_files.append(len(snapshot_files(spark, f"{out}/{BIG_TABLE}")))

    bigram_rows = read_snapshot(spark, f"{out}/{BIG_TABLE}").count()
    scored = read_snapshot(spark, f"{out}/{SCORES_TABLE}").count()
    print(
        json.dumps(
            {
                "batch_docs": batch_docs,
                "n_batches": n_batches,
                "cores": cpus,
                "batch_sec": [round(w, 2) for w in walls],
                # ratio from UNROUNDED walls, guarded against a sub-5 ms
                # first batch rounding to 0.0
                "last_over_first": (
                    round(walls[-1] / walls[0], 2) if walls[0] > 0 else None
                ),
                "bigram_rows": bigram_rows,
                "scored_docs": scored,
                "compact_every": compact_every,
                "max_files": max_files,
                "live_files": live_files,
                "compact_sec": compact_walls,
            }
        )
    )


if __name__ == "__main__":
    main()
