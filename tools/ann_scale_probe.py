"""Embedding-operator throughput probe at a corpus size where fixed
overhead is noise: N synthetic unit vectors (seeded Spark-side generation
— xxhash64-derived components, every 10th vector an exact copy of its
predecessor so the dedup path has real drops) through the embedding
family's heaviest operators:

- SemDeDup (Lloyd cells -> within-cell cosine prune -> keep/drop), with
  quantizer granularity K grown proportionally to N (K ~ N/780) so
  per-vector pair work stays constant — the 100 TB operating rule the
  operator docstring states;
- PQ encode + ADC scan (4x16 codebooks, 20-query LUT stage-1 top-50);
- IVF assignment (the index build's bulk step).

The sf0.1 bench corpus is 5k vectors — small enough that JVM fixed costs
dominate; this probe runs at 50k+ and reports vecs/s per operator, the
scaling evidence BASELINE.md cites for the embedding family.  Generation
happens in the executors (spark.range -> column expressions; the driver
only ever sees the K x DIM centroid model state).

Usage: python tools/ann_scale_probe.py [N] [runs]
Prints one JSON line: {"n_vecs": ..., "cores": ..., "ops": {name:
{"best_sec": ..., "vecs_per_sec": ...}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NEARDUP_EVERY = 10


def synthetic_vecs(spark, n: int):
    """(vec_id, u): deterministic unit vectors; every 10th is an exact
    copy of its predecessor (planted semantic duplicates)."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        DIM,
    )

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    src = F.when(
        F.col("vec_id") % NEARDUP_EVERY == 1, F.col("vec_id") - 1
    ).otherwise(F.col("vec_id"))
    comps = [
        (F.xxhash64(src * DIM + F.lit(d)) / F.lit(float(2**63))).alias(f"x{d}")
        for d in range(DIM)
    ]
    v = F.array(*comps)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return base.select(
        "vec_id", F.transform(v, lambda x: x / nrm).alias("u")
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 50_000
    runs = int(pos[1]) if len(pos) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        SQ8_CAND,
        _dot,
        _ivf_train,
        _l2_nearest,
        _subvec,
        assign_cells,
        semdedup_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark()
    # size-keyed path: concurrent probes at different N must not clobber
    # each other's corpus mid-run
    path = f"/tmp/ann_probe_corpus_{n}"
    synthetic_vecs(spark, n).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    train = emb.filter(F.col("vec_id") % 5 == 0)

    k_cells = max(16, n // 780)  # K ~ N: constant per-vector pair work

    # Codebooks/centroids are model state, trained ONCE per corpus
    # refresh (a handful of small jobs over the 20% sample); the probe
    # times the per-vector scan paths that grow with the corpus.
    cents = _ivf_train(train, spark, k=k_cells)
    books = [
        _ivf_train(
            train.select("vec_id", _subvec(F.col("u"), s).alias("u")),
            spark,
            nearest=_l2_nearest,
            k=PQ_K,
        )
        for s in range(PQ_M)
    ]

    def run_semdedup():
        return semdedup_from(emb, spark, cents=cents).filter(
            F.col("is_kept") == 0
        ).count()

    def run_pq_adc():
        codes = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            *[
                _l2_nearest(_subvec(F.col("u"), s), books[s]).alias(f"c{s}")
                for s in range(PQ_M)
            ],
        )
        lut_entries = [
            _dot(_subvec(F.col("u"), s), F.lit(c))
            for s in range(PQ_M)
            for c in books[s]
        ]
        q = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), F.array(*lut_entries).alias("lut")
        )
        parts = [
            F.element_at(F.col("lut"), (F.col(f"c{s}") + 1 + s * PQ_K).cast("int"))
            for s in range(PQ_M)
        ]
        adc = F.round(((parts[0] + parts[1]) + parts[2]) + parts[3], 4)
        w1 = Window.partitionBy("query_id").orderBy(
            F.desc("qscore"), F.asc("neighbor_id")
        )
        return (
            F.broadcast(q)
            .crossJoin(codes)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", adc.alias("qscore"))
            .withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= SQ8_CAND)
            .count()
        )

    def run_ivf_assign():
        # through the production dispatcher: literal argmin below 256
        # cells, broadcast centroid-table join at or above (K ~ N puts
        # the 200k run exactly at the switch point)
        return (
            assign_cells(emb, cents)
            .groupBy("cell")
            .count()
            .count()
        )

    def run_ivf_assign_2l():
        # the K ∝ N scale path: two-level (coarse-group) assignment —
        # ~sqrt(K) + 2*K/sqrt(K) dot products per vector instead of K.
        # Throughput-only here (the probe corpus is uniform; assignment
        # QUALITY on clustered data — its target regime — is pinned in
        # tests/test_ops.py::test_assign_twolevel_agreement)
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
            assign_cells_twolevel,
        )

        return (
            assign_cells_twolevel(emb, cents)
            .groupBy("cell")
            .count()
            .count()
        )

    def run_rp_stage1():
        # JL-projected candidate generation (ann_topk_rp stage 1):
        # project every vector to 16 rounded doubles, score 20 queries
        # against all N projections, keep top RP_CAND per query
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
            RP_CAND,
            _rp_proj,
        )

        proj = emb.select(
            F.col("vec_id").alias("neighbor_id"), _rp_proj(F.col("u")).alias("cp")
        )
        q = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), _rp_proj(F.col("u")).alias("qp")
        )
        w1 = Window.partitionBy("query_id").orderBy(
            F.desc("qscore"), F.asc("neighbor_id")
        )
        return (
            F.broadcast(q)
            .crossJoin(proj)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(_dot(F.col("qp"), F.col("cp")), 4).alias("qscore"),
            )
            .withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= RP_CAND)
            .count()
        )

    def run_semdedup_2l():
        # SemDeDup end-to-end on the K ∝ N scale path: the same
        # within-cell prune, assignment routed through the two-level
        # coarse quantizer (the explicit opt-in for K grown with N)
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
            assign_cells_twolevel,
        )

        return (
            semdedup_from(emb, spark, cents=cents, assign=assign_cells_twolevel)
            .filter(F.col("is_kept") == 0)
            .count()
        )

    ops = {
        "semdedup": run_semdedup,
        "semdedup_2l": run_semdedup_2l,
        "pq_encode_adc": run_pq_adc,
        "ivf_assign": run_ivf_assign,
        "ivf_assign_2l": run_ivf_assign_2l,
        "rp_project_stage1": run_rp_stage1,
    }
    # --ops=a,b,c selects a subset: the O(N*K) exact forms (semdedup,
    # ivf_assign) are deliberately skippable at N where K ∝ N makes
    # them quadratic — the 500k row already measured that cliff
    sel = next((a for a in sys.argv[1:] if a.startswith("--ops=")), None)
    if sel:
        keep = set(sel.split("=", 1)[1].split(","))
        ops = {k: v for k, v in ops.items() if k in keep}
    out = {}
    for name, fn in ops.items():
        fn()  # warmup (codegen JIT, one Lloyd train)
        best = min(_timed(fn) for _ in range(runs))
        out[name] = {"best_sec": round(best, 2), "vecs_per_sec": int(n / best)}

    print(
        json.dumps(
            {"n_vecs": n, "dim": 64, "cores": cpus, "k_cells": k_cells, "ops": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
