"""Hard-negative triplet mining at a corpus size where the scan term
dominates: the VERDICT r6 evidence probe that the anchors x corpus
cartesian of the exact form is GONE from the wired scale path.

Reuses the ANN probe's clustered corpus and persisted two-level IVF
index (same /tmp cache keys — building either probe warms the other)
and labels each vector with its latent cluster, so same-label positives
exist by construction and label blocks at 1M vectors (~2k members)
exceed TRIPLET_BLOCK_CAP — the sub-sharding path runs for real.

Measures the NEGATIVE stage both ways over the same anchor set and the
same partner exclusions:

- exact: anchors x full-corpus scan -> anti-join partners -> rank-1
  (the designed quadratic of ``embedding_triplets``, the yardstick);
- probed: ``_probe_cells_twolevel`` -> ``_ivf_probe_scored`` against the
  persisted cell-partitioned index -> the SAME ``_rank1_negatives``
  (the ``embedding_triplets_ivf`` / serving shape).

Prints one JSON line with wall times, speedup, and agreement stats
(fraction of anchors whose probed negative IS the exact hardest, and
the mean hardness ratio cos_an_probe / cos_an_exact — how close the
probe's negative is when it differs).

Usage: python tools/triplet_scale_probe.py [N_vectors] [runs] [n_anchors]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ANCHORS = 200


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_anchors = int(sys.argv[3]) if len(sys.argv) > 3 else N_ANCHORS
    k_cells = max(16, int(math.isqrt(n)))

    from pyspark.sql import functions as F

    from tools.ann_scale_probe import N_LATENT, synthetic_unit_vectors
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        TRIPLET_POS_TAU,
        _dot,
        _ivf_train,
        _probe_cells_twolevel,
        _ivf_probe_scored,
        _rank1_negatives,
        _sq8_code,
        assign_cells_twolevel,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark()
    corpus_path = f"/tmp/ann_probe_corpus_c1_{n}"
    index_path = f"/tmp/ann_probe_ivf_c1_{n}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic_unit_vectors(spark, n).write.mode("overwrite").parquet(corpus_path)
    emb = spark.read.parquet(corpus_path).withColumn(
        "label", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_LATENT))
    )

    train = emb.filter(F.col("vec_id") % max(1, n // 20_000) == 0)
    t0 = time.monotonic()
    cents = _ivf_train(train, spark, k=k_cells)
    train_sec = time.monotonic() - t0

    if not os.path.exists(os.path.join(index_path, "_SUCCESS")):
        assigned = emb.join(
            assign_cells_twolevel(emb, cents).select("vec_id", "cell"), "vec_id"
        ).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("u").alias("cu"),
            _sq8_code(F.col("u")).alias("cc"),
            "cell",
        )
        assigned.repartition("cell").write.partitionBy("cell").mode(
            "overwrite"
        ).parquet(index_path)

    # ---- anchors + partner exclusions (shared by both forms) ----
    anchors = emb.filter(F.col("vec_id") < n_anchors).select(
        F.col("vec_id").alias("query_id"), "u", "label"
    ).persist()
    anchors.count()
    # positives for these anchors: same-label + exact cosine >= tau
    # (labels are the latent clusters, so blocks carry real positives)
    blk = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("u").alias("bu"), "label"
    )
    pcos = F.round(_dot(F.col("u"), F.col("bu")), 4)
    partners = (
        anchors.join(blk, "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("anchor"), "neighbor_id", pcos.alias("c")
        )
        .filter(F.col("c") >= TRIPLET_POS_TAU)
        .select("anchor", "neighbor_id")
        .persist()
    )
    n_partners = partners.count()

    def _timed(fn) -> float:
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    # ---- exact: anchors x corpus scan ----
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("cu"))
    sim = F.round(_dot(F.col("qu"), F.col("cu")), 4)
    exact_scored = (
        anchors.select(F.col("query_id").alias("anchor"), F.col("u").alias("qu"))
        .crossJoin(cand)
        .filter(F.col("anchor") != F.col("neighbor_id"))
        .select("anchor", "neighbor_id", sim.alias("cos_an"))
    )
    exact_neg = _rank1_negatives(exact_scored, partners)
    exact_best = None
    for _ in range(runs):
        t = _timed(lambda: exact_neg.count())
        exact_best = t if exact_best is None or t < exact_best else exact_best
    exact_rows = {r["anchor"]: r for r in exact_neg.collect()}

    # ---- probed: persisted-index IVF shape ----
    def probed_neg():
        q = _probe_cells_twolevel(
            spark, anchors.select("query_id", "u"), cents
        )
        scored = _ivf_probe_scored(q, spark.read.parquet(index_path)).select(
            F.col("query_id").alias("anchor"),
            "neighbor_id",
            F.col("cosine").alias("cos_an"),
        )
        return _rank1_negatives(scored, partners)

    probed_neg().count()  # warmup (codegen over the probe plan)
    probe_best = None
    for _ in range(runs):
        t = _timed(lambda: probed_neg().count())
        probe_best = t if probe_best is None or t < probe_best else probe_best
    probe_rows = {r["anchor"]: r for r in probed_neg().collect()}

    shared = set(exact_rows) & set(probe_rows)
    agree = sum(
        1 for a in shared if exact_rows[a]["negative"] == probe_rows[a]["negative"]
    )
    ratios = [
        probe_rows[a]["cos_an"] / exact_rows[a]["cos_an"]
        for a in shared
        if exact_rows[a]["cos_an"] > 0
    ]
    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_anchors": n_anchors,
                "n_partner_exclusions": n_partners,
                "k_cells": k_cells,
                "train_sec": round(train_sec, 2),
                "exact_scan_best_sec": round(exact_best, 2),
                "probed_best_sec": round(probe_best, 2),
                "speedup": round(exact_best / probe_best, 1),
                "negative_agreement": round(agree / max(1, len(shared)), 4),
                "mean_hardness_ratio": round(
                    sum(ratios) / max(1, len(ratios)), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
