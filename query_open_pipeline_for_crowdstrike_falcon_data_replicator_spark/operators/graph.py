"""Graph analytics over the near-duplicate document graph.

The LSH pair set (``dedup_minhash_lsh``) IS a graph — docs are vertices,
verified near-dup pairs are edges — and two classic distributed graph
operators complete the curation toolkit the cluster/star CC ops started:

- triangle counting: the local-clustering signal (a doc in many
  triangles sits inside a tightly-mutually-similar boilerplate family,
  not a chain of pairwise borderline matches — a different dedup
  confidence than component size);
- PageRank: within-component centrality, the principled "which copy is
  canonical" signal (``dedup_cluster_best`` ranks by an external quality
  model; PageRank ranks by the graph itself).

Scale design (100 TB):

- Triangles use DEGREE ORIENTATION (Suri & Vassilvitskii's MR-friendly
  form): orient each undirected edge from its lower-(degree, id) endpoint
  to the higher, enumerate length-2 paths only from each vertex's
  oriented OUT-edges, and close them against the canonical edge set.
  Out-degrees under this orientation are bounded by O(sqrt(m)), so wedge
  generation is O(m^1.5) worst-case instead of sum(deg^2) — the hub that
  breaks the naive a<b<c self-join contributes only sqrt-bounded wedges.
  Every stage is a shuffle on vertex/edge keys; nothing is quadratic in
  corpus size (the LSH bucket cap already bounds raw degrees upstream).
- PageRank is the standard join-aggregate power iteration — messages
  shuffle on dst, partial-aggregated map-side — but in FIXED-POINT
  integer arithmetic: ranks are micro-units (1.0 = 1_000_000), each
  per-edge contribution is ``pr DIV deg`` (integer division), and the
  damping step is ``150000 + (85 * sum) DIV 100``.  Integer sums are
  order-independent, so the result is bit-identical across engines,
  partitionings, and retries — which is what makes an exact DuckDB
  oracle (5 unrolled iterations) possible, and at cluster scale makes
  the computation deterministic under speculative execution.  The
  quantization error vs float PageRank is < deg * 1e-6 per step —
  irrelevant for ranking.

The edge lists here are derived, post-filter tables: joins against them
hint ``shuffle_hash`` where Catalyst's derived-stats estimate could
otherwise pick a plan-time broadcast (the substring-dedup OOM lesson);
no plan-time broadcast rides a corpus-derived table.  Reference has no graph ops at all (beyond-reference surface,
same rationale as the dedup family: ``qopcfdr_stream_loader.py`` ships
events one at a time and never compares two documents).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tracked_persist
from .dedup import JACCARD_SHINGLES_CTE, JACCARD_THRESHOLD, near_dup_pairs

PAGERANK_ITERS = 5
PR_ONE = 1_000_000  # fixed-point scale: 1.0 rank unit = 1e6 micro-units


def _near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (doc_a < doc_b) verified near-dup pairs from the
    build-once pair artifact (``dedup.near_dup_pairs``), persisted —
    both operators and both directions read it repeatedly."""
    return tracked_persist(
        near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the near-dup graph via
    degree orientation: rank vertices by (degree, id), orient every edge
    low->high, build wedges from co-ranked out-neighbor pairs, and close
    each wedge against the canonical edge set.  Each triangle is found
    exactly once (at its lowest-ranked apex), then credited to all three
    corners.  Output: one row per doc in >=1 triangle."""
    return triangle_count_from(_near_dup_edges(spark, sf_dir))


def triangle_count_from(pairs: DataFrame) -> DataFrame:
    """Core oriented triangle count over canonical (doc_a < doc_b) pairs
    — separated from the LSH derivation so scale probes can feed
    synthetic edge sets of controlled size and skew."""
    und = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    deg = und.groupBy("doc_a").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed(
        "doc_a", "node"
    )
    # orientation by (deg, id): strict total order, so each undirected
    # edge survives in exactly one direction
    oriented = (
        und.join(deg.withColumnsRenamed({"node": "doc_a", "deg": "deg_a"}), "doc_a")
        .join(deg.withColumnsRenamed({"node": "doc_b", "deg": "deg_b"}), "doc_b")
        .filter(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("doc_a") < F.col("doc_b")))
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    oriented = tracked_persist(oriented)
    # wedges at the apex: unordered out-neighbor pairs, id-canonicalized
    # so the closing edge lookup hits the doc_a<doc_b pair set directly
    o2 = oriented.withColumnRenamed("dst", "dst2")
    wedges = oriented.join(o2, "src").filter(F.col("dst") < F.col("dst2"))
    tri = wedges.join(
        pairs.hint("shuffle_hash"),
        (wedges["dst"] == pairs["doc_a"]) & (wedges["dst2"] == pairs["doc_b"]),
    ).select("src", "dst", "dst2")
    corners = tri.select(
        F.explode(F.array("src", "dst", "dst2")).alias("doc_id")
    )
    return corners.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (damping 0.85, ``PAGERANK_ITERS`` power
    iterations) over the undirected near-dup graph.  All arithmetic is
    64-bit integer micro-units — see the module docstring for why that
    buys cross-engine bit-equality and retry determinism.  Every vertex
    has degree >= 1 by construction (it appears in a pair), so there is
    no dangling-mass term.  Output: (doc_id, pr_micro)."""
    return pagerank_from(_near_dup_edges(spark, sf_dir))


def pagerank_from(pairs: DataFrame) -> DataFrame:
    """Core fixed-point PageRank over canonical (doc_a < doc_b) pairs —
    separated from the LSH derivation for the scale probes."""
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg_src) once, persisted: the loop re-reads it per
    # iteration; hash-partitioned on src so the per-iteration rank join
    # co-locates without a fresh edge shuffle
    cedges = tracked_persist(
        edges.join(deg.hint("shuffle_hash"), "src").repartition("src")
    )
    pr = deg.select("src", F.lit(PR_ONE).cast("bigint").alias("pr"))
    for _ in range(PAGERANK_ITERS):
        msgs = (
            cedges.join(pr.hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr DIV deg")).alias("s"))
        )
        pr = msgs.select(
            F.col("dst").alias("src"),
            (F.lit(150_000) + F.expr("(85 * s) DIV 100")).cast("bigint").alias("pr"),
        )
    return pr.select(F.col("src").alias("doc_id"), F.col("pr").alias("pr_micro"))


LPA_ROUNDS = 4


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation (Raghavan
    et al. 2007) over the near-dup graph, ``LPA_ROUNDS`` unrolled
    rounds: every vertex starts labeled with its own id and each round
    adopts the most frequent label among its NEIGHBORS (ties to the
    smallest label).  LPA finds locally-dense communities where
    connected components find reachability — a long chain of borderline
    pairs is one component but many communities, a different dedup
    grouping than ``dedup_cluster``.

    Deterministic by construction: synchronous updates (round k reads
    only round k-1's labels), integer counts, min-label ties — so the
    fixed-round result is well-defined even on structures where free
    LPA oscillates, and the DuckDB oracle replays it exactly.  Scale
    shape: per round one shuffle join of the persisted src-partitioned
    edge table against the label table plus two map-side-combining
    aggregates; label picking is ``min(struct(-cnt, label))`` — no
    windows, nothing quadratic, survivor tables ride shuffle_hash.
    Output: (doc_id, label)."""
    return lpa_from(_near_dup_edges(spark, sf_dir))


def lpa_from(pairs: DataFrame) -> DataFrame:
    """Core synchronous LPA over canonical (doc_a < doc_b) pairs — the
    composable form (same contract as ``pagerank_from``)."""
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    cedges = tracked_persist(edges.repartition("src"))
    labels = cedges.select("src").distinct().withColumn("label", F.col("src"))
    for _ in range(LPA_ROUNDS):
        counts = (
            cedges.join(labels.hint("shuffle_hash"), "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
                ).alias("m")
            )
            .select(F.col("dst").alias("src"), F.col("m.label").alias("label"))
        )
    return labels.select(F.col("src").alias("doc_id"), "label")


def _lpa_chain_sql() -> tuple[str, str]:
    """(WITH-body, final-label-CTE-name) replaying ``lpa_from`` exactly
    — shared by the LPA and modularity oracles.  Label CTEs are
    MATERIALIZED: each round's labels feed the next round's count join,
    and DuckDB would otherwise inline the chain (the k-core 2^n
    lesson)."""
    rounds = []
    prev = "l0"
    for t in range(1, LPA_ROUNDS + 1):
        rounds.append(
            f"c{t} AS MATERIALIZED (\n"
            f"  SELECT e.dst, p.label, count(*) AS cnt\n"
            f"  FROM e JOIN {prev} p ON p.node = e.src\n"
            f"  GROUP BY e.dst, p.label),\n"
            f"l{t} AS MATERIALIZED (\n"
            f"  SELECT dst AS node, label FROM (\n"
            f"    SELECT dst, label, row_number() OVER (\n"
            f"      PARTITION BY dst ORDER BY cnt DESC, label ASC) AS rn\n"
            f"    FROM c{t}) WHERE rn = 1)"
        )
        prev = f"l{t}"
    chain = ",\n".join(rounds)
    body = f"""{_PAIRS_CTE.strip()},
e AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
{chain}"""
    return body, prev


def _lpa_oracle_sql() -> str:
    """Unrolled synchronous rounds: neighbor-label counts, then the
    (cnt desc, label asc) pick per vertex."""
    body, final = _lpa_chain_sql()
    return f"""
WITH {body}
SELECT node AS doc_id, label FROM {final}
"""


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities, EXACT integer
    arithmetic: per community c, the contribution to
    Q = Σ_c [e_c/m − (d_c/2m)²] is emitted as the numerator over the
    common denominator 4m² — ``q_num = 4·m·e_c − d_c²`` — with the raw
    intra-edge count ``e_c`` and degree mass ``d_c`` alongside, so
    Q = Σ q_num / (4m²) reconstructs exactly and both engines agree
    bit-for-bit (no fraction ever becomes a float).  The community
    quality yardstick for the dedup grouping: Q near 0 means the LPA
    labels carve nothing denser than chance.

    Scale shape: two label attachments (shuffle_hash equi-joins of the
    persisted LPA labels onto the pair set and onto the degree table),
    two map-side-combining per-label aggregates — nothing quadratic,
    no windows.  Int64 envelope: q_num needs d_c² < 2^63, i.e. degree
    mass up to ~3.0e9 per community — far beyond any honest community
    (the LSH bucket cap bounds degrees upstream); a corpus exceeding it
    moves q_num to decimal.  Output: (label, e_c, d_c, q_num)."""
    return modularity_from(_near_dup_edges(spark, sf_dir))


def modularity_from(pairs: DataFrame) -> DataFrame:
    """Exact modularity numerators over any canonical (doc_a < doc_b)
    pair set, communities from ``lpa_from`` (same composable contract
    as ``pagerank_from``)."""
    labels = tracked_persist(lpa_from(pairs))
    labels.count()  # materialize: three attachments below
    m = pairs.count()
    intra = (
        pairs.join(
            labels.selectExpr("doc_id AS doc_a", "label AS la").hint(
                "shuffle_hash"
            ),
            "doc_a",
        )
        .join(
            labels.selectExpr("doc_id AS doc_b", "label AS lb").hint(
                "shuffle_hash"
            ),
            "doc_b",
        )
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    ends = pairs.selectExpr("doc_a AS src").union(
        pairs.selectExpr("doc_b AS src")
    )
    deg = ends.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dc = (
        deg.join(
            labels.selectExpr("doc_id AS src", "label").hint("shuffle_hash"),
            "src",
        )
        .groupBy("label")
        .agg(F.sum("deg").alias("d_c"))
    )
    e_c = F.coalesce(F.col("e_c"), F.lit(0)).cast("long")
    return dc.join(intra.hint("shuffle_hash"), "label", "left").select(
        "label",
        e_c.alias("e_c"),
        F.col("d_c").cast("long").alias("d_c"),
        (F.lit(4 * m) * e_c - F.col("d_c") * F.col("d_c"))
        .cast("long")
        .alias("q_num"),
    )


def _modularity_oracle_sql() -> str:
    """The LPA chain, then the same integer recurrence: intra-edge
    counts per label, degree mass per label, q_num = 4·m·e_c − d_c²
    (DuckDB HUGEINT intermediates cast back to BIGINT)."""
    body, final = _lpa_chain_sql()
    return f"""
WITH {body},
lab AS (SELECT node, label FROM {final}),
mm AS (SELECT count(*) AS m FROM pairs),
intra AS (
  SELECT la.label, count(*) AS e_c
  FROM pairs p
  JOIN lab la ON la.node = p.doc_a
  JOIN lab lb ON lb.node = p.doc_b AND lb.label = la.label
  GROUP BY la.label),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
dc AS (
  SELECT label, sum(deg) AS d_c
  FROM deg JOIN lab ON lab.node = deg.src GROUP BY 1)
SELECT dc.label,
       CAST(coalesce(e_c, 0) AS BIGINT) AS e_c,
       CAST(d_c AS BIGINT) AS d_c,
       CAST(4 * m * coalesce(e_c, 0) - d_c * d_c AS BIGINT) AS q_num
FROM dc LEFT JOIN intra USING (label) CROSS JOIN mm
"""


KCORE_K = 2
KCORE_ROUNDS = 5


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core peeling over the near-dup graph: ``KCORE_ROUNDS`` unrolled
    rounds of "drop vertices with degree < KCORE_K, keep edges whose
    BOTH endpoints survive".  The 2-core separates densely-duplicated
    boilerplate FAMILIES from pendant one-off pairs — a different dedup
    confidence than component size (a 100-doc chain is a big component
    with an empty 2-core; a 4-clique is a small component entirely
    inside it).

    Fixed round count keeps the oracle an unrolled CTE chain (the
    PageRank convention): the result equals the true k-core whenever the
    peel converges within the rounds (the LSH graph's planted families
    peel in <= 2; a deeper production graph raises KCORE_ROUNDS or
    switches to the convergence loop of connected_components).  Every
    round is one map-side-combined degree count + two semi-joins on
    vertex keys — nothing quadratic, survivor sets are derived data and
    ride shuffle_hash semi-joins, never a plan-time broadcast.
    Output: (doc_id, core_deg) for vertices in the (round-limited)
    2-core."""
    return kcore_from(_near_dup_edges(spark, sf_dir))


def kcore_from(pairs: DataFrame) -> DataFrame:
    """K-core peel over any canonical (doc_a < doc_b) pair set — the
    composable core of ``graph_kcore`` (same contract as
    ``triangle_count_from`` / ``pagerank_from``; used by the scale probe
    and the streaming graph maintenance path)."""
    edges = tracked_persist(
        pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
            pairs.selectExpr("doc_b AS src", "doc_a AS dst")
        )
    )
    # fixpoint short-circuit: survivor sets shrink monotonically, so two
    # consecutive rounds with EQUAL counts mean equal sets — every later
    # round is the identity filter and the output matches the fully
    # unrolled oracle exactly.  The per-round count is one aggregate over
    # the (tiny, persisted) survivor set — the convergence-check shape
    # connected_components already uses.
    prev_n = None
    for _ in range(KCORE_ROUNDS):
        keep = tracked_persist(
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("src")
        )
        n = keep.count()
        if n == prev_n:
            break
        prev_n = n
        edges = tracked_persist(
            edges.join(keep.hint("shuffle_hash"), "src", "left_semi").join(
                keep.withColumnRenamed("src", "dst").hint("shuffle_hash"),
                "dst",
                "left_semi",
            )
        )
    return (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .select(F.col("src").alias("doc_id"), "core_deg")
    )


# --------------------------------------------------------------------- #
# Oracles: the exact-Jaccard pair set (same LSH-recall argument as
# DEDUP_MINHASH_SQL) re-derived as a CTE, then pure-SQL graph math.
# --------------------------------------------------------------------- #

_PAIRS_CTE = f"""
{JACCARD_SHINGLES_CTE.strip()},
sh AS (SELECT doc_id, sh FROM sh_all),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
)
"""

# id-ordered enumeration (a<b<c) — the SAME triangle set the oriented
# Spark plan finds, since orientation only changes the discovery order
TRIANGLE_SQL = f"""
WITH {_PAIRS_CTE.strip()},
tri AS (
  SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_a = e1.doc_b
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
corners AS (SELECT unnest([x, y, z]) AS doc_id FROM tri)
SELECT doc_id, count(*) AS n_triangles FROM corners GROUP BY doc_id
"""


def _pagerank_oracle_sql() -> str:
    """Unrolled power iteration: same integer micro-unit recurrence as
    the Spark loop (DuckDB ``//`` == Spark ``DIV`` on non-negative
    operands); HUGEINT intermediates cast back to BIGINT."""
    rounds = []
    prev = "pr0"
    for t in range(1, PAGERANK_ITERS + 1):
        rounds.append(
            f"pr{t} AS (\n"
            f"  SELECT e.dst AS node,\n"
            f"         CAST(150000 + (85 * sum(p.pr // d.deg)) // 100 AS BIGINT) AS pr\n"
            f"  FROM e JOIN {prev} p ON p.node = e.src\n"
            f"         JOIN deg d ON d.node = e.src\n"
            f"  GROUP BY e.dst)"
        )
        prev = f"pr{t}"
    chain = ",\n".join(rounds)
    return f"""
WITH {_PAIRS_CTE.strip()},
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
pr0 AS (SELECT node, CAST({PR_ONE} AS BIGINT) AS pr FROM deg),
{chain}
SELECT node AS doc_id, pr AS pr_micro FROM {prev}
"""


def _kcore_oracle_sql() -> str:
    """Unrolled peel: per round, degree count -> survivor set -> edge
    filter on both endpoints.  Every round's CTEs are MATERIALIZED:
    DuckDB inlines CTEs by default, and each round references the
    previous edge set twice (degree count + filter), so the un-hinted
    chain re-derives the exact-Jaccard pair join 2^rounds times."""
    rounds = []
    prev = "e0"
    for t in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"k{t} AS MATERIALIZED (\n"
            f"  SELECT src FROM (SELECT src, count(*) AS deg FROM {prev} GROUP BY 1)\n"
            f"  WHERE deg >= {KCORE_K}),\n"
            f"e{t} AS MATERIALIZED (\n"
            f"  SELECT e.src, e.dst FROM {prev} e\n"
            f"  JOIN k{t} a ON a.src = e.src\n"
            f"  JOIN k{t} b ON b.src = e.dst)"
        )
        prev = f"e{t}"
    chain = ",\n".join(rounds)
    return f"""
WITH {_PAIRS_CTE.strip()},
e0 AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
{chain}
SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY 1
"""


GRAPH_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "graph_triangle_count": (graph_triangle_count, TRIANGLE_SQL),
    "graph_pagerank": (graph_pagerank, _pagerank_oracle_sql()),
    "graph_kcore": (graph_kcore, _kcore_oracle_sql()),
    "graph_label_propagation": (graph_label_propagation, _lpa_oracle_sql()),
    "graph_modularity": (graph_modularity, _modularity_oracle_sql()),
}
