"""ANN serve-path probe at a corpus size where fixed overhead is noise:
N synthetic CLUSTERED unit vectors (seeded Spark-side generation — the
regime the two-level quantizer assumes and real embedding corpora
exhibit) through the persisted-IVF serving stack:

1. train a K ∝ sqrt(N) quantizer on a deterministic sample (outside the
   timer — the documented operating model: centroids train once per
   corpus refresh),
2. assign the corpus with the TWO-LEVEL path (``assign_cells_twolevel``
   — the K ∝ N escape that keeps assignment off the O(N*K) cliff) and
   write the (neighbor_id, cu, cc, cell) index PARTITIONED BY cell,
3. serve a sampled query set through ``ivf_query_index`` (both the
   full-precision and the codes-first SQ8 pass) — partition-pruned
   probe reads, the 100 TB claim this probe evidences,
4. brute-force the same queries for ground truth and report recall@10.

Prints one JSON line:
{"n_vectors": ..., "k_cells": ..., "dim": ..., "cores": ...,
 "build": {"train_sec": ..., "assign_write_sec": ...},
 "serve": {"ivf": {"best_sec": ..., "qps": ..., "recall_at_10": ...},
           "ivf_sq8": {...}},
 "brute": {"best_sec": ..., "qps": ...}}

Usage: python tools/ann_scale_probe.py [N_vectors] [runs] [n_queries]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
N_LATENT = 512  # planted cluster structure (quantizer premise)
N_QUERIES = 64
RECALL_K = 10


def synthetic_unit_vectors(spark, n: int):
    """(vec_id, u): deterministic clustered unit vectors, generated in
    the executors — each vector is its latent cluster's center plus
    small per-vector noise, normalized JVM-side."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    cl = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_LATENT))
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    comp = lambda d: (  # noqa: E731
        (F.pmod(F.xxhash64(cl * 131 + d), F.lit(2001)) - 1000) / 1000.0
        + (F.pmod(F.xxhash64(F.col("vec_id") * 977 + d), F.lit(2001)) - 1000)
        / 5000.0
    )
    v = F.transform(dims, comp)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return base.select(
        "vec_id", F.transform(v, lambda x: x / nrm).alias("u")
    )


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else N_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))
    k_cells = max(16, int(math.isqrt(n)))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _dot,
        _ivf_train,
        _sq8_code,
        assign_cells_twolevel,
        ivf_query_index,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark()
    # generator-versioned paths ("c1" = clustered v1): a stale corpus
    # from an older generator silently poisons the recall numbers (the
    # uniform-vector corpus from the previous probe version measured
    # recall 0.10 here before this was keyed)
    corpus_path = f"/tmp/ann_probe_corpus_c1_{n}"
    index_path = f"/tmp/ann_probe_ivf_c1_{n}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_unit_vectors(spark, n).write.mode("overwrite").parquet(
            corpus_path
        )
    emb = spark.read.parquet(corpus_path)

    # ---- build (train outside the serve timer, as documented) ----
    train = emb.filter(F.col("vec_id") % max(1, n // 20_000) == 0)
    t0 = time.monotonic()
    cents = _ivf_train(train, spark, k=k_cells)
    train_sec = time.monotonic() - t0

    def write_index():
        assigned = emb.join(
            assign_cells_twolevel(emb, cents).select("vec_id", "cell"),
            "vec_id",
        ).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("u").alias("cu"),
            _sq8_code(F.col("u")).alias("cc"),
            "cell",
        )
        # cluster by cell before the partitioned write: without it every
        # write task emits a fragment into every cell directory (~32
        # files x K cells — 16k+ tiny files at 1M/K=1000, and the serve
        # read pays an open() per file)
        assigned.repartition("cell").write.partitionBy("cell").mode(
            "overwrite"
        ).parquet(index_path)

    assign_write_sec = _timed(write_index)

    # ---- query set + exact ground truth ----
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "u")
        .persist()
    )
    q.count()
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("cu"))
    sim = F.round(_dot(F.col("qu"), F.col("cu")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    brute = (
        q.select("query_id", F.col("u").alias("qu"))
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RECALL_K)
    )
    brute_best = None
    for _ in range(runs):
        t = _timed(lambda: brute.count())
        brute_best = t if brute_best is None or t < brute_best else brute_best
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in brute.collect()
    }

    # ---- radius (range) serving: probed tau filter vs exact tau join.
    # tau=0.9 keeps a query's latent cluster (intra-cluster cosine
    # ~0.95+) and excludes the near-orthogonal background — the regime
    # radius search exists for.
    RADIUS_TAU = 0.9
    exact_radius = (
        q.select("query_id", F.col("u").alias("qu"))
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .filter(F.col("cosine") >= RADIUS_TAU)
    )
    radius_truth = {
        (r["query_id"], r["neighbor_id"]) for r in exact_radius.collect()
    }
    serve_radius = lambda: ivf_query_index(  # noqa: E731
        spark, index_path, q, cents, twolevel=True, radius=RADIUS_TAU
    )
    serve_radius().count()  # warmup
    radius_best = None
    for _ in range(runs):
        t = _timed(lambda: serve_radius().count())
        radius_best = t if radius_best is None or t < radius_best else radius_best
    radius_got = {
        (r["query_id"], r["neighbor_id"]) for r in serve_radius().collect()
    }
    radius_out = {
        "tau": RADIUS_TAU,
        "best_sec": round(radius_best, 2),
        "qps": round(n_queries / radius_best, 1),
        "truth_pairs": len(radius_truth),
        "recall": round(
            len(radius_got & radius_truth) / max(1, len(radius_truth)), 4
        ),
        "precision_exact": len(radius_got - radius_truth) == 0,
    }

    # ---- serve paths ----
    out_serve = {}
    for name, sq8 in (("ivf", False), ("ivf_sq8", True)):
        # twolevel=True: the index was assigned through the two-level
        # coarse quantizer, so serving walks the SAME quantizer — the
        # symmetry recall depends on (see _probe_cells_twolevel)
        serve = lambda: ivf_query_index(  # noqa: E731
            spark, index_path, q, cents, sq8=sq8, k=RECALL_K, twolevel=True
        )
        serve().count()  # warmup (codegen JIT over the probe plan)
        best = None
        for _ in range(runs):
            t = _timed(lambda: serve().count())
            best = t if best is None or t < best else best
        got = {
            (r["query_id"], r["neighbor_id"]) for r in serve().collect()
        }
        out_serve[name] = {
            "best_sec": round(best, 2),
            "qps": round(n_queries / best, 1),
            "recall_at_10": round(len(got & truth) / len(truth), 4),
        }

    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_queries": n_queries,
                "k_cells": k_cells,
                "dim": DIM,
                "cores": cpus,
                "build": {
                    "train_sec": round(train_sec, 2),
                    "assign_write_sec": round(assign_write_sec, 2),
                },
                "serve": out_serve,
                "radius": radius_out,
                "brute": {
                    "best_sec": round(brute_best, 2),
                    "qps": round(n_queries / brute_best, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
