"""Graph-operator throughput probe at an edge-set size where fixed
overhead is noise: a synthetic near-dup-shaped graph with N vertices and
~N edges (planted 4-cliques for triangle signal, chain edges for
diameter, plus one deliberate hub so the degree-orientation bound is
exercised against real skew), through both graph operators:

- triangle counting (degree orientation: wedge work bounded O(m^1.5)
  regardless of the hub's degree),
- fixed-point PageRank (5 power iterations, integer micro-units),
- k-core decomposition (iterative peeling with fixpoint short-circuit),
- large-star/small-star connected components — run on the shared graph
  (throughput) AND on a dedicated length-N path graph (star_cc_chain),
  the diameter adversary where min-label propagation would need N
  rounds and the star rewrite needs O(log n).

The sf0.1 near-dup graph is a few hundred edges — small enough that JVM
fixed costs dominate; this probe runs at 100k+ edges and reports
edges/s per operator, the scaling evidence BASELINE.md cites for the
graph family.  Generation happens in the executors (spark.range ->
column expressions; the driver never sees an edge).

Usage: python tools/graph_scale_probe.py [N_vertices] [runs]
Prints one JSON line: {"n_vertices": ..., "n_edges": ..., "cores": ...,
"ops": {name: {"best_sec": ..., "edges_per_sec": ...}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIQUE_BLOCK = 20  # vertices 20b..20b+3 form a 4-clique in each block
HUB_EVERY = 100  # vertex 1 additionally touches every 100th vertex


def synthetic_pairs(spark, n: int):
    """Canonical (doc_a < doc_b) edge set: planted 4-cliques (6 edges per
    20-vertex block -> guaranteed triangles), a sparsified chain (paths,
    no triangles), and a hub whose degree grows linearly with N — the
    skew case degree orientation exists to survive."""
    from pyspark.sql import functions as F

    blocks = spark.range(n // CLIQUE_BLOCK).select(
        (F.col("id") * CLIQUE_BLOCK).alias("b")
    )
    clique_offsets = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cliques = blocks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("b") + i).alias("doc_a"),
                        (F.col("b") + j).alias("doc_b"),
                    )
                    for i, j in clique_offsets
                ]
            )
        ).alias("e")
    ).select("e.doc_a", "e.doc_b")
    chain = (
        spark.range(n - 1)
        .filter(F.col("id") % 3 != 0)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    hub = (
        spark.range(n // HUB_EVERY)
        .filter(F.col("id") > 0)
        .select(
            F.lit(1).cast("bigint").alias("doc_a"),
            (F.col("id") * HUB_EVERY + 7).alias("doc_b"),
        )
    )
    return cliques.union(chain).union(hub).distinct()


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        connected_components_star,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        kcore_from,
        pagerank_from,
        triangle_count_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
        release_tracked_caches,
    )

    from pyspark.sql import functions as F

    spark = get_spark()
    path = f"/tmp/graph_probe_edges_{n}"
    synthetic_pairs(spark, n).write.mode("overwrite").parquet(path)
    pairs = spark.read.parquet(path)
    m = pairs.count()
    # dedicated diameter adversary: one path of n vertices (n-1 edges);
    # min-label CC needs diameter rounds here, the star rewrite O(log n)
    chain_path = f"/tmp/graph_probe_chain_{n}"
    spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).write.mode("overwrite").parquet(chain_path)
    chain_edges = spark.read.parquet(chain_path)

    def run_triangles():
        return triangle_count_from(pairs).count()

    def run_pagerank():
        return pagerank_from(pairs).count()

    def run_kcore():
        return kcore_from(pairs).count()

    def run_star_cc():
        return connected_components_star(
            pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        ).count()

    def run_star_cc_chain():
        # correctness built in: a single path is ONE component
        out = connected_components_star(chain_edges)
        n_comp = out.select("cluster_rep").distinct().count()
        assert n_comp == 1, f"path graph must be 1 component, got {n_comp}"
        return n_comp

    ops = {
        "triangle_count": (run_triangles, m),
        "pagerank_5it": (run_pagerank, m),
        "kcore": (run_kcore, m),
        "star_cc": (run_star_cc, m),
        "star_cc_chain": (run_star_cc_chain, n - 1),
    }
    out = {}
    for name, (fn, m_op) in ops.items():
        fn()  # warmup (codegen JIT)
        release_tracked_caches()
        best = None
        for _ in range(runs):
            t = _timed(fn)
            release_tracked_caches()
            best = t if best is None or t < best else best
        out[name] = {
            "best_sec": round(best, 2),
            "edges_per_sec": int(m_op / best),
        }
    print(
        json.dumps(
            {"n_vertices": n, "n_edges": m, "cores": cpus, "ops": out}
        )
    )


if __name__ == "__main__":
    main()
