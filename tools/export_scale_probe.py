"""Composed export-pipeline probe: per-batch curate+pack latency as the
accepted corpus GROWS — the composition's 100 TB question is whether
the stage COUPLING (the packer's read-back of the batch's admitted
rows) adds a term that grows with corpus size on top of the two stages'
own (separately probed) costs.

Feeds B equal synthetic batches (dedup_scale_probe's generator, shifted
doc_id ranges) through ``export.export_batch`` against one persisted
output, timing each batch end-to-end (curation's three commits + the
admitted read-back + packing's two commits).  The read-back claim under
test: each docs append carries one batch_id literal, so the pushed-down
equality filter skips other batches' row groups at footer cost — the
coupling should stay O(batch) while the corpus grows.

Usage: python tools/export_scale_probe.py [batch_docs] [n_batches]
[compact_every]
Prints one JSON line: {"batch_docs": ..., "n_batches": ..., "cores":
..., "batch_sec": [...], "last_over_first": ..., "accepted_docs": ...,
"packed_rows": ..., "total_tokens": ..., "compact_every": ...,
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
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
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
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.curation import (
        BANDS_TABLE,
        DOCS_TABLE,
        PROFILES_TABLE,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.export import (
        CURATE_DIR,
        PACK_DIR,
        export_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.packing import (
        PACKED_TABLE,
        STATE_TABLE,
        _running_total,
    )

    spark = get_spark()
    out = f"/tmp/export_probe_{batch_docs}x{n_batches}c{compact_every}"
    shutil.rmtree(out, ignore_errors=True)

    corpus_path = f"/tmp/export_probe_corpus_{batch_docs * n_batches}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_docs(spark, batch_docs * n_batches).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    tables = [
        os.path.join(CURATE_DIR, t)
        for t in (DOCS_TABLE, BANDS_TABLE, PROFILES_TABLE)
    ] + [os.path.join(PACK_DIR, PACKED_TABLE)]
    docs_tbl = os.path.join(out, CURATE_DIR, DOCS_TABLE)

    walls: list[float] = []
    compact_walls: list[float] = []
    live_files: list[int] = []
    for b in range(n_batches):
        lo, hi = b * batch_docs, (b + 1) * batch_docs
        batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.monotonic()
        export_batch(spark, batch, out, b, txn_app="export-probe")
        walls.append(time.monotonic() - t0)
        t1 = time.monotonic()
        if compact_twin_tables(
            spark,
            out,
            tables,
            txn_app="export-probe",
            batch_id=b,
            canonical=os.path.join(CURATE_DIR, PROFILES_TABLE),
            compact_every=compact_every,
        ):
            compact_walls.append(round(time.monotonic() - t1, 2))
        live_files.append(len(snapshot_files(spark, docs_tbl)))

    accepted = read_snapshot(spark, docs_tbl).count()
    packed = read_snapshot(
        spark, os.path.join(out, PACK_DIR, PACKED_TABLE)
    ).count()
    total = _running_total(spark, os.path.join(out, PACK_DIR, STATE_TABLE))
    print(
        json.dumps(
            {
                "batch_docs": batch_docs,
                "n_batches": n_batches,
                "cores": cpus,
                "batch_sec": [round(w, 2) for w in walls],
                "last_over_first": (
                    round(walls[-1] / walls[0], 2) if walls[0] > 0 else None
                ),
                "accepted_docs": accepted,
                "packed_rows": packed,
                "total_tokens": int(total),
                "compact_every": compact_every,
                "live_files": live_files,
                "compact_sec": compact_walls,
            }
        )
    )


if __name__ == "__main__":
    main()
