"""Tar-shard export probe: does export cost scale with the corpus and
stay chunk-bounded in memory — the 100 TB question for the delivery
step (one tar per (shard, TAR_SHARD_DOCS chunk) via applyInPandas).

Writes N synthetic documents as a parquet corpus, exports the full tar
shard set, and reports wall seconds, tar count, and bytes at two
corpus sizes — the linearity check (a super-linear term would mean a
group somewhere holds more than its chunk).

Usage: python tools/tar_export_probe.py [n_docs] [n_docs_2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 400_000]

    from pyspark.sql import SparkSession

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        export_tar_shards,
        read_tar_shards,
    )
    from tools.dedup_scale_probe import synthetic_docs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cores": int(cpus), "points": []}
    for n in sizes:
        base = tempfile.mkdtemp(prefix="qopcfdr_tarprobe_")
        try:
            sf_dir = os.path.join(base, "sf")
            os.makedirs(sf_dir)
            synthetic_docs(spark, n).write.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            tar_dir = os.path.join(base, "tars")
            t0 = time.time()
            n_tars = export_tar_shards(spark, sf_dir, tar_dir).count()
            wall = time.time() - t0
            tar_bytes = sum(
                os.path.getsize(os.path.join(tar_dir, f))
                for f in os.listdir(tar_dir)
            )
            t1 = time.time()
            n_read = read_tar_shards(spark, tar_dir).count()
            read_wall = time.time() - t1
            if n_read != n:
                raise RuntimeError(f"round-trip lost docs: {n_read} != {n}")
            out["points"].append(
                {
                    "docs": n,
                    "export_sec": round(wall, 2),
                    "read_sec": round(read_wall, 2),
                    "tars": n_tars,
                    "mb": round(tar_bytes / 1e6, 1),
                }
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    p = out["points"]
    if len(p) >= 2:
        out["export_scaling"] = round(
            (p[-1]["export_sec"] / p[0]["export_sec"])
            / (p[-1]["docs"] / p[0]["docs"]),
            3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
