"""Deduplication operators over the ``documents`` table.

Four families, each a first-class scale-out design:

- exact:      md5-fingerprint hash-groupBy (one shuffle on the hash);
- n-gram Jaccard: token-3-gram shingles -> inverted-index self-join ->
              exact Jaccard (the verification oracle; O(sum of posting
              list^2) — use on candidates, not the full corpus, at scale);
- MinHash+LSH: 32 min-hashes -> 16 banded buckets -> bucket self-join for
              candidates -> exact-Jaccard verify.  This is the 100 TB
              path: no O(n^2) anywhere, shuffles are on band keys and
              candidate pairs only;
- SimHash:    60-bit signature via token-hash bit votes; 4 banded 15-bit
              buckets -> candidates -> Hamming-distance filter.

Shingles are hashed to 64-bit longs at creation (xxhash64 over the token
triple — no shingle strings are materialized), so every downstream stage
(signatures, band keys, collect_set shuffles, array_intersect verify)
moves 8-byte longs.  The DuckDB oracles still compute string-shingle
Jaccard: hashed-set Jaccard equals it up to 64-bit collisions
(P ~ |doc|^2/2^64 per pair), and the banded LSH recalls a j=0.8 pair with
probability 1-(1-j^2)^16 (~1-8e-8)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tracked_persist
from ..sources.tables import load_table, spread

JACCARD_THRESHOLD = 0.8
NUM_MINHASHES = 32
BANDS = 16  # rows-per-band = 2; P[candidate] at j=0.8 is 1-(1-0.64)^16 ~ 0.9999


def _hashed_shingles_of(t: Column) -> Column:
    """Distinct token-3-gram shingles, each hashed straight to a 64-bit
    long: ``xxhash64(tok[i], tok[i+1], tok[i+2])`` — no concatenated
    shingle string is ever built.  Downstream (min-hash, band keys, set
    intersection, shuffle payloads) then works on 8-byte longs instead of
    ~30-byte strings.  Jaccard over hashed shingles equals string-shingle
    Jaccard up to 64-bit collisions (P ~ |doc|^2 / 2^64 per pair)."""
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.xxhash64(
            F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
        ),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


def token_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + tokens, tokenized AFTER a repartition of the raw text: the
    documents table arrives as one parquet file -> one scan task, and
    split/lower/hash are the CPU-bound steps, so spread the rows first.
    (On a real lake the source has many files/row-groups and the scan
    itself is parallel; the repartition is then unnecessary but harmless —
    one corpus-sized shuffle.)"""
    return spread(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + array of hashed shingles.  The tokens projection stays a
    SEPARATE select from the shingle transform: CollapseProject declines to
    merge them because ``toks`` is referenced 4x, so split() runs once per
    row instead of being inlined into every lambda use."""
    return token_docs(spark, sf_dir).select(
        "doc_id", _hashed_shingles_of(F.col("toks")).alias("shingles")
    )


def postings_of(docs: DataFrame) -> DataFrame:
    """Inverted-index postings (doc_id, shingle_hash) for ANY
    (doc_id, text) frame — the DF-parametric core of ``shingle_postings``,
    reused by the streaming curation gate where the input is a micro-batch
    rather than the documents table.

    explode_outer + post-filter instead of explode: plain explode makes
    the optimizer infer a `size(shingles) > 0` filter and push it below
    the exchange, where the whole shingle expression gets re-evaluated per
    row on the raw text.  explode_outer infers no filter; dropping the
    NULL rows afterwards is one cheap post-exchange predicate."""
    toks = docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
    shingled = toks.select(
        "doc_id", _hashed_shingles_of(F.col("toks")).alias("shingles")
    )
    return (
        shingled.select("doc_id", F.explode_outer("shingles").alias("sh"))
        .filter(F.col("sh").isNotNull())
    )


def shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``postings_of`` over the documents table (with the single-file
    spread of ``token_docs``)."""
    return (
        shingled_docs(spark, sf_dir)
        .select("doc_id", F.explode_outer("shingles").alias("sh"))
        .filter(F.col("sh").isNotNull())
    )


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint: canonical id + duplicate count
    per distinct normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.lower(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(text)) AS fingerprint,
       min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------- #
# n-gram Jaccard pairs (inverted index, stop-shingle capped)
# --------------------------------------------------------------------- #
# Document-frequency cap: a shingle present in more than this many docs is
# boilerplate (licence headers, navigation chrome) and is dropped BEFORE
# the posting-list self-join — the join cost is sum(df^2) over shingles,
# so one stop-shingle shared by 1% of a 1B-doc corpus would otherwise
# dominate everything.  Standard dedup practice; Jaccard is computed over
# the capped shingle sets (the oracle applies the same rule).
JACCARD_DF_CAP = 100


def capped_postings(postings: DataFrame, cap: int = JACCARD_DF_CAP) -> DataFrame:
    """Drop postings of shingles whose document frequency exceeds ``cap``.
    The hot-shingle set is tiny by construction (few distinct shingles can
    exceed a DF cap), so it broadcasts and the filter costs no shuffle of
    the postings themselves beyond the DF aggregation."""
    hot = (
        postings.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .select("sh")
    )
    return postings.join(F.broadcast(hot), "sh", "left_anti")


def jaccard_pairs_from(postings: DataFrame) -> DataFrame:
    """Exact Jaccard pairs >= threshold from a (doc_id, sh) posting list
    via inverted-index self-join."""
    exploded = postings
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no persist: the int64 postings recompute faster than a cache
    # materialize+read cycle (split/hash is cheap and fully parallel;
    # measured 1.5s vs 3.5s at sf0.1)
    return jaccard_pairs_from(capped_postings(shingle_postings(spark, sf_dir)))


JACCARD_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
sh_all AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM toks
)
"""

# uncapped pair set: the oracle for minhash-LSH (full shingle sets)
JACCARD_PAIRS_BODY = f"""
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""

JACCARD_PAIRS_SQL = f"""
WITH {JACCARD_SHINGLES_CTE.strip()},
sh AS (SELECT doc_id, sh FROM sh_all),
{JACCARD_PAIRS_BODY.strip()}
"""

# capped variant: identical rule to capped_postings (DF > cap dropped)
JACCARD_CAPPED_SQL = f"""
WITH {JACCARD_SHINGLES_CTE.strip()},
hot AS (
  SELECT sh FROM sh_all GROUP BY sh HAVING count(*) > {JACCARD_DF_CAP}
),
sh AS (SELECT doc_id, sh FROM sh_all ANTI JOIN hot USING (sh)),
{JACCARD_PAIRS_BODY.strip()}
"""


# --------------------------------------------------------------------- #
# Containment (asymmetric) near-dup pairs
# --------------------------------------------------------------------- #
# Broder's containment C(A,B) = |A∩B|/|A|: the measure Jaccard blinds
# itself to when a SHORT doc is embedded inside a LONG one (quote-with-
# commentary, boilerplate-wrapped reposts) — there J ≈ |A|/|B| stays far
# below any dedup threshold while C(A,B) ≈ 1.  Same inverted-index
# self-join and DF-capped postings as the Jaccard path (the cap bounds
# per-shingle fanout, so nothing is quadratic in corpus size); the only
# change is the denominator.
CONTAINMENT_THRESHOLD = 0.9


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs where either direction's shingle containment >= threshold:
    (doc_a, doc_b, containment_a, containment_b) with containment_a =
    |A∩B|/|A| (how much of A lives inside B).  Both engines gate on the
    ROUNDED values, so threshold-edge pairs agree bit-for-bit."""
    postings = capped_postings(shingle_postings(spark, sf_dir))
    sizes = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = postings.alias("a")
    b = postings.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common") / F.col("sa.n"), 4).alias("containment_a"),
            F.round(F.col("n_common") / F.col("sb.n"), 4).alias("containment_b"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= CONTAINMENT_THRESHOLD
        )
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH {JACCARD_SHINGLES_CTE.strip()},
hot AS (
  SELECT sh FROM sh_all GROUP BY sh HAVING count(*) > {JACCARD_DF_CAP}
),
sh AS (SELECT doc_id, sh FROM sh_all ANTI JOIN hot USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common / CAST(sa.n AS DOUBLE), 4) AS containment_a,
       round(n_common / CAST(sb.n AS DOUBLE), 4) AS containment_b
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE greatest(round(n_common / CAST(sa.n AS DOUBLE), 4),
               round(n_common / CAST(sb.n AS DOUBLE), 4))
      >= {CONTAINMENT_THRESHOLD}
"""


# --------------------------------------------------------------------- #
# MinHash + LSH (banded) with exact-Jaccard verification
# --------------------------------------------------------------------- #
def minhash_profiles(postings: DataFrame) -> DataFrame:
    """Per-doc LSH profile in ONE shuffle: 32 min(xxhash64(seed, sh))
    signatures + the exact hashed-shingle set, fused into a single groupBy
    so the min()s partial-aggregate map-side and ride the collect_set
    exchange.  Everything is 8-byte longs end to end (seeded re-hash of
    the shingle hash), so the shuffle payload and the min comparisons stay
    inside whole-stage codegen."""
    aggs = [
        F.min(F.xxhash64(F.lit(k), F.col("sh"))).alias(f"sig{k}")
        for k in range(NUM_MINHASHES)
    ]
    return postings.groupBy("doc_id").agg(
        F.collect_set("sh").alias("shingles"), *aggs
    )


def lsh_bands(signed: DataFrame) -> DataFrame:
    """Band keys: xxhash64 over each pair of adjacent signature rows."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.col(f"sig{2*b}"), F.col(f"sig{2*b+1}")).alias("key"),
        )
        for b in range(BANDS)
    ])
    return signed.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


# A band bucket larger than this emits STAR edges (every member to the
# bucket's min doc_id) instead of all pairs.  Giant buckets are what
# shared boilerplate manufactures at scale — members sit at j ~ 0.2
# where every one of the m^2/2 candidate pairs fails Jaccard
# verification, so all-pairs inside them is pure quadratic waste
# (measured: 500k synthetic docs with a 1-in-7 boilerplate span produced
# 53M candidates, >99.9% of them bucket-blowup; the cap removes the
# quadratic term while the star keeps every member one verified hop from
# the rep, so genuine mutual-near-dup clusters stay CC-connected).  The
# trade, stated honestly: for a cluster of >cap MUTUAL near-dups the
# enumerated pair LIST is rep-to-member only (the full list of a giant
# duplicate cluster is quadratic by definition); clustering semantics
# (dedup_cluster/_best) are unaffected.
LSH_BUCKET_CAP = 100


def lsh_candidates(bands: DataFrame, cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) from banded-LSH buckets: all-pairs
    within buckets of <= cap members, star-to-min within larger ones.

    Shape: the band table crosses ONE exchange (the whole-bucket window
    that tags every row with its bucket's count and min — a window, not
    a collect, so a giant boilerplate bucket streams through a spillable
    buffer instead of materializing in one aggregation row), then both
    branches stay on that partitioning: star edges read (rep, m) off
    their own row, and small buckets — only after the <= cap filter, so
    the collected array is bounded by cap — regroup WITHOUT a second
    exchange (same (band, key) clustering) into a sorted member list
    whose ordered pairs explode in place.  The old form consumed the
    window THREE times and self-joined the corpus-scale band rows
    (building an 80k-row broadcast at sf0.1 and an unbounded one at
    scale); a stats-aggregate variant was MEASURED at +32% shuffle
    records (mostly-unique buckets make the stats table as big as the
    band table itself).  Nothing here is quadratic in bucket size above
    the cap, and no per-bucket state is unbounded."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "key")
    tagged = bands.withColumn("m", F.count(F.lit(1)).over(w)).withColumn(
        "rep", F.min("doc_id").over(w)
    )
    star = tagged.filter(
        (F.col("m") > cap) & (F.col("doc_id") != F.col("rep"))
    ).select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    members = (
        tagged.filter(F.col("m") <= cap)
        .groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ms"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    allpairs = members.select(F.explode(pair_arr).alias("p")).select(
        F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
    )
    return allpairs.union(star).distinct()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates from banded-LSH buckets (bucket-capped, see
    lsh_candidates), verified by exact Jaccard over the candidates'
    shingle sets only (never all pairs).

    Join order puts the tiny candidate-pair set on the build side (AQE
    broadcasts it), so the heavy per-doc shingle arrays are scanned from
    the persisted profile without an extra exchange."""
    profiles = tracked_persist(minhash_profiles(shingle_postings(spark, sf_dir)))
    candidates = lsh_candidates(lsh_bands(profiles))
    arrays = profiles.select("doc_id", "shingles")
    sa = arrays.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrays.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# the oracle for LSH is the exact pair set: with 16 bands x 2 rows the miss
# probability at j=0.8 is (1-0.8^2)^16 ~ 8e-8 (and the corpus near-dups sit
# at j~0.97 where it is ~1e-20) — verified equal in tests at sf0.01/sf0.1
DEDUP_MINHASH_SQL = JACCARD_PAIRS_SQL


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair set as a build-once ARTIFACT
    (fingerprint-salted parquet, same protocol as the quantizer/LM
    models): downstream graph analytics — clustering, triangles,
    PageRank — consume the pair GRAPH repeatedly, and production builds
    it once per corpus version rather than re-running minhash->LSH->
    verify inside every consumer.  Content is byte-identical to a live
    ``dedup_minhash_lsh`` run (the derivation is deterministic), so
    every consumer's oracle replay is unaffected."""
    import os
    import tempfile

    from ..sinks.artifacts import build_once, corpus_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        tempfile.gettempdir(),
        f"qopcfdr_pairs1_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{corpus_fingerprint(docs)}",
    )
    p = build_once(
        path,
        "_SUCCESS",
        lambda stage: dedup_minhash_lsh(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(stage),
    )
    return spark.read.parquet(p)


# --------------------------------------------------------------------- #
# Incremental dedup: new batch vs existing corpus
# --------------------------------------------------------------------- #
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch AGAINST an existing corpus (the production
    shape: a daily increment lands next to a 100 TB corpus; near-dups of
    existing documents are dropped before ingestion).  Here the corpus is
    even doc_ids and the batch is odd doc_ids.

    Candidates come from a band-key equi-join between the batch's band
    keys and the corpus's — never batch x corpus.  At scale the corpus
    side is a PRE-BUILT index (profiles + band keys persisted partitioned
    by band, exactly like ``ivf_build_index``): the increment's band keys
    are dim-sized, so the join broadcasts them and reads only the touched
    corpus buckets; re-profiling the corpus per batch — or any crossJoin —
    never happens.  Verification is exact Jaccard on candidate pairs only."""
    profiles = tracked_persist(minhash_profiles(shingle_postings(spark, sf_dir)))
    is_new = F.col("doc_id") % 2 == 1

    # band rows that ALSO carry the full 16-key array (128 bytes): the
    # corpus side streams from the cached profiles (no exchange pays the
    # width) and the increment side is broadcast-small, so the join can
    # keep only each pair's FIRST agreeing band (first_agreeing_band)
    # and the old candidate-table distinct — the only exchange on this
    # path, candidate-scale — disappears
    def keyed_bands(signed: DataFrame) -> DataFrame:
        keys = F.array(*[
            F.xxhash64(F.col(f"sig{2*b}"), F.col(f"sig{2*b+1}"))
            for b in range(BANDS)
        ])
        return signed.select("doc_id", keys.alias("keys")).select(
            "doc_id", "keys", F.posexplode("keys").alias("band", "key")
        )

    new_bands = keyed_bands(profiles.filter(is_new))
    corpus_bands = keyed_bands(profiles.filter(~is_new))
    agrees = [
        F.element_at(F.col("a.keys"), j + 1)
        == F.element_at(F.col("b.keys"), j + 1)
        for j in range(BANDS)
    ]
    candidates = (
        corpus_bands.alias("a")
        .join(
            F.broadcast(new_bands.alias("b")),  # increment side is small
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.band") == first_agreeing_band(agrees)),
        )
        .select(
            F.col("a.doc_id").alias("corpus_doc"), F.col("b.doc_id").alias("new_doc")
        )
    )
    arrays = profiles.select("doc_id", "shingles")
    sa = arrays.select(F.col("doc_id").alias("corpus_doc"), F.col("shingles").alias("sh_a"))
    sb = arrays.select(F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    return (
        candidates.join(sa, "corpus_doc")
        .join(sb, "new_doc")
        .select("new_doc", "corpus_doc", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# oracle: exact cross-parity Jaccard pairs (same LSH-recall argument as
# DEDUP_MINHASH_SQL)
DEDUP_INCREMENTAL_SQL = f"""
WITH {JACCARD_SHINGLES_CTE.strip()},
sh AS (SELECT doc_id, sh FROM sh_all),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT b.doc_id AS new_doc, a.doc_id AS corpus_doc, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY 1, 2
)
SELECT new_doc, corpus_doc,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = corpus_doc
JOIN sizes sb ON sb.doc_id = new_doc
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------- #
# Near-dup clustering: connected components over the pair graph
# --------------------------------------------------------------------- #
# Pairwise near-dup output is not yet a dedup decision: if A~B and B~C the
# pipeline must keep ONE of {A,B,C}, which requires the transitive closure
# of the pair relation.  Components are computed by iterative min-label
# propagation (each round: one hash-join + one partial-aggregating groupBy,
# both on the label frame — never on the corpus), which converges in
# O(graph diameter) rounds.  Near-dup components are quasi-cliques (every
# member overlaps the same shingle mass), so the diameter is tiny in
# practice; for adversarially chain-shaped graphs the same loop structure
# accepts the large-star/small-star rewrite (Kiveris et al., "Connected
# Components in MapReduce and Beyond", SoCC'14), which bounds rounds by
# O(log^2 n) — noted here, not needed for near-dup graphs.
CC_MAX_ROUNDS = 25


def connected_components_star(edges: DataFrame) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — O(log n)
    rounds in the GRAPH SIZE, independent of diameter, so chain-shaped
    graphs (sequentially-edited near-dup lineages) converge where
    min-label propagation needs diameter rounds.

    Each round: large-star hangs every neighbor v > u onto m(u) =
    min(Γ(u) ∪ {u}); small-star re-hangs every neighbor v <= u (and u
    itself) onto m(u).  Both are one groupBy (min) + one join — no
    adjacency lists are ever collected.  Converges when the edge set is
    a fixed point: every node points at its component minimum.  Returns
    ``(doc_id, cluster_rep)`` for every vertex, reps included."""
    # symmetric view: Γ(u) from both directions
    rounds = 0
    edges = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    while True:
        rounds += 1
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("mn", F.col("src")).alias("m"))
        # large-star: (v, m(u)) for v in Γ(u), v > u
        large = (
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        edges2 = (
            large.filter(F.col("src") != F.col("dst")).distinct()
            .localCheckpoint(eager=True)
        )
        # small-star on the large-star output
        sym2 = edges2.union(
            edges2.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m2 = sym2.groupBy("src").agg(F.min("dst").alias("mn"))
        m2 = m2.select("src", F.least("mn", F.col("src")).alias("m"))
        small = (
            sym2.join(m2, "src")
            .filter(F.col("dst") <= F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(m2.select("src", F.col("m").alias("dst")))
        )
        new_edges = (
            small.filter(F.col("src") != F.col("dst")).distinct()
            .localCheckpoint(eager=True)
        )
        # fixed point: the (node -> min) star set stopped changing
        if rounds > 1 and new_edges.exceptAll(edges).limit(1).count() == 0 and (
            edges.exceptAll(new_edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges = new_edges
        if rounds > 60:  # log2 bound with huge margin; defensive only
            raise RuntimeError("connected_components_star: no fixed point")
    labels = edges.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_rep"))
    reps = labels.select(F.col("cluster_rep").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_rep")
    )
    return labels.union(reps).distinct()


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label connected components over an undirected edge list
    ``(src, dst)`` (one row per direction).  Returns ``(doc_id, cluster_rep)``
    where ``cluster_rep`` is the minimum doc_id reachable from ``doc_id``.

    Scale shape: state is one (node, label) row per VERTEX OF THE PAIR
    GRAPH — near-dup vertices are a tiny fraction of the corpus, the
    corpus itself is never touched.  Each round shuffles the label frame
    once (join on dst) and partially aggregates map-side (min).  Lineage is
    cut every round with an eager localCheckpoint so plan size stays O(1)
    in rounds.

    Near-dup pair graphs are shallow (duplicate clusters are dense, so
    min labels reach everything in a few hops); when a pathological
    chain-shaped graph (diameter > CC_MAX_ROUNDS) defeats that
    assumption, the computation FALLS BACK to the alternating
    large-star/small-star variant (``connected_components_star``), whose
    round count is O(log n) in graph size regardless of diameter —
    graceful degradation instead of the pre-round-5 hard failure."""
    edges = edges.localCheckpoint(eager=True)  # don't re-derive LSH per round
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CC_MAX_ROUNDS):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["src"], "left")
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            return labels.select("doc_id", F.col("label").alias("cluster_rep"))
    # diameter exceeded the near-dup assumption: hand the graph to the
    # O(log n)-round star variant instead of failing
    return connected_components_star(edges)


def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup decision: minhash-LSH near-dup pairs -> connected
    components -> one canonical representative per cluster.  Output is one
    row per CLUSTERED document: its cluster representative (minimum doc_id
    in the component), the cluster size, and whether this doc is the one
    to keep (``is_rep``) — the drop-list is ``is_rep = false``.

    The reference has no dedup at all; this is the standard
    training-corpus pipeline composition (pairs are necessary but not
    sufficient — transitivity is what makes "keep one copy" well-defined)."""
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    labels = connected_components(edges)
    # cluster_size via a window count, not a broadcast-join of the
    # per-cluster table: cluster COUNT scales with the corpus, so a
    # plan-time broadcast of the derived sizes table is the
    # OOM-at-scale pattern; the window is one shuffle on cluster_rep
    from pyspark.sql import Window

    size_w = F.count(F.lit(1)).over(Window.partitionBy("cluster_rep"))
    return labels.select(
        "doc_id",
        "cluster_rep",
        size_w.alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_rep"),
    )


# Oracle: transitive closure of the EXACT Jaccard pair set via a recursive
# CTE — min reachable doc_id per vertex (same LSH-recall argument as
# DEDUP_MINHASH_SQL for pair-set equality).
DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {JACCARD_SHINGLES_CTE.strip()},
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
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
  FROM reach GROUP BY src
),
csizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM labels GROUP BY 1
)
SELECT doc_id, cluster_rep, cluster_size, doc_id = cluster_rep AS is_rep
FROM labels JOIN csizes USING (cluster_rep)
"""


def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_cluster`` with components computed by the alternating
    large-star/small-star variant (``connected_components_star``) — the
    same output contract (cluster rep = component minimum, a property of
    the GRAPH, not the algorithm), so the identical recursive-CTE
    closure oracle verifies it cross-engine.  Registered separately so
    the O(log n)-round chain-graph path is driver-verified on the real
    LSH pair graph, not only unit-tested on synthetic chains."""
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    labels = connected_components_star(edges)
    # window count, not a broadcast of the corpus-scale sizes table
    # (see dedup_cluster)
    from pyspark.sql import Window

    size_w = F.count(F.lit(1)).over(Window.partitionBy("cluster_rep"))
    return labels.select(
        "doc_id",
        "cluster_rep",
        size_w.alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_rep"),
    )


def dedup_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scored canonical selection: the same LSH pair graph and
    connected components as ``dedup_cluster``, but the survivor of each
    cluster is the member with the HIGHEST trained quality-model logit
    (ties to the lower doc_id) — how production corpora actually pick
    the kept copy (keep the cleanest near-duplicate, not the one with
    the smallest id).

    Scale shape: the per-cluster ranking window partitions on
    cluster_rep over pair-graph vertices only (a tiny fraction of the
    corpus); the quality score joins in on doc_id — no new corpus pass
    beyond the model inference scan."""
    from pyspark.sql import Window

    from .text import text_quality_model

    labels = dedup_cluster(spark, sf_dir).select(
        "doc_id", "cluster_rep", "cluster_size"
    )
    quality = text_quality_model(spark, sf_dir).select("doc_id", "logit")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("logit"), F.asc("doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .withColumn("is_survivor", (F.row_number().over(w) == 1).cast("int"))
        .select("doc_id", "cluster_rep", "cluster_size", "logit", "is_survivor")
    )


def _cluster_best_oracle_sql() -> str:
    """DEDUP_CLUSTER_SQL's transitive closure + the quality model's full
    train+score replay (a nested WITH in a derived table) + the ranking
    window."""
    from .text import TEXT_QUALITY_MODEL_SQL

    body = DEDUP_CLUSTER_SQL.strip()
    assert body.endswith("FROM labels JOIN csizes USING (cluster_rep)")
    prefix = body[: body.rindex("SELECT doc_id, cluster_rep")].strip()
    return f"""
{prefix},
quality AS (
  SELECT doc_id, logit FROM ({TEXT_QUALITY_MODEL_SQL})
)
SELECT l.doc_id, l.cluster_rep, c.cluster_size, q.logit,
       CAST(row_number() OVER (PARTITION BY l.cluster_rep
                ORDER BY q.logit DESC, l.doc_id ASC) = 1 AS INT)
         AS is_survivor
FROM labels l
JOIN csizes c USING (cluster_rep)
JOIN quality q ON q.doc_id = l.doc_id
"""


# --------------------------------------------------------------------- #
# SimHash (60-bit, banded Hamming candidates)
# --------------------------------------------------------------------- #
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits each; catches all pairs with hamming <= 3
HAMMING_MAX = 3


def first_agreeing_band(agrees: list[Column]) -> Column:
    """Index of the FIRST true entry in per-band agreement predicates
    (the last band is the fallback — callers only evaluate this on rows
    whose join already matched SOME band, so a match exists).

    The exactly-once-emission trick shared by every banded-Hamming
    self-join (simhash / phash / audio / video / embedding near-dup): a
    pair agreeing on several bands joins once per agreeing band, and the
    classic fix is a trailing ``.distinct()`` — one full
    HashAggregate+Exchange+HashAggregate over the candidate table.  When
    both join sides carry the FULL signature anyway (they do, for the
    Hamming distance), lower-band agreement is expressible in the join
    itself: keep only the row whose band equals the first agreeing band
    and every pair is emitted exactly once — the distinct becomes dead
    weight and its exchange disappears."""
    expr = F.when(agrees[0], F.lit(0))
    for i in range(1, len(agrees) - 1):
        expr = expr.when(agrees[i], F.lit(i))
    return expr.otherwise(F.lit(len(agrees) - 1))


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash: per distinct token, a 60-bit md5-derived hash votes
    +1/-1 per bit position; the signature takes the majority sign.

    Bit-count lanes instead of 60 vote aggregates: each token packs its
    60 bits as 16-bit counter lanes into 15 longs (4 lanes/long), the
    groupBy sums 15 longs + one token count, and bit b of the signature
    is set iff 2*lane_count(b) > n_tokens — identical majority votes
    (vote_b = 2*cnt_b - n), with a 4x narrower aggregate and shuffle row.
    16-bit lanes are safe to 65k distinct tokens per document."""
    docs = spread(spark, load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    n_lanes = SIMHASH_BITS // 4  # 15 longs, 4 x 16-bit lanes each
    packs = []
    for i in range(n_lanes):
        lane = None
        for j in range(4):
            b = 4 * i + j
            bit = F.shiftright(h, b).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, 16 * j)
            lane = term if lane is None else lane + term
        packs.append(F.sum(lane).alias(f"p{i}"))
    voted = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"), *packs
    )
    sig = None
    for b in range(SIMHASH_BITS):
        cnt = F.shiftright(F.col(f"p{b // 4}"), 16 * (b % 4)).bitwiseAND(
            F.lit((1 << 16) - 1)
        )
        bit = F.when(cnt * 2 > F.col("n_tok"), F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    # a doc with >65535 distinct tokens would overflow its 16-bit lanes and
    # silently corrupt votes for ADJACENT bit positions — fail loudly
    # instead (wrapped into the output expression so pruning can't drop it)
    guard = F.assert_true(
        F.col("n_tok") <= F.lit((1 << 16) - 1),
        F.lit("simhash: >65535 distinct tokens/doc overflows 16-bit vote lanes"),
    )
    return voted.select("doc_id", F.when(guard.isNull(), sig).alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with Hamming distance <= 3 over the 60-bit SimHash,
    via 4x15-bit band buckets (pigeonhole: any pair within distance 3
    agrees on at least one band)."""
    sigs = tracked_persist(simhash_signatures(spark, sf_dir))
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("key"),
                )
                for b in range(SIMHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    x = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ham = F.bit_count(x)
    # exactly-once emission via the first agreeing band (see
    # first_agreeing_band): no trailing distinct, no pair-table exchange
    agrees = [
        F.shiftright(x, b15 * 15).bitwiseAND(F.lit((1 << 15) - 1)) == 0
        for b15 in range(SIMHASH_BANDS)
    ]
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.band") == first_agreeing_band(agrees)),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


# SimHash oracle: the signature is md5-derived (portable via DuckDB's
# CAST('0x'||hex AS BIGINT)), so the ENTIRE banded pipeline — bit votes,
# 60-bit signature, 4x15-bit band buckets, Hamming<=3 — mirrors exactly.
DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
  FROM documents
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks
),
votes AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, (SELECT unnest(range({SIMHASH_BITS})) AS b) b
  GROUP BY doc_id, b.b
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band.p AS band,
         (simhash >> (band.p * 15)) & 32767 AS key
  FROM sigs, (SELECT unnest(range({SIMHASH_BANDS})) AS p) band
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""


# --------------------------------------------------------------------- #
# substring (span-grain) dedup
# --------------------------------------------------------------------- #
# Document-grain dedup misses the long-tail failure mode of web corpora:
# boilerplate spans (headers, license blocks, templated paragraphs)
# repeated VERBATIM across otherwise-distinct documents.  The fix from
# "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
# ACL 2022) removes any >= 50-token span occurring more than once in the
# corpus; their suffix-array construction is replaced here by the
# standard distributed approximation — every k-token window is hashed and
# counted corpus-wide — because a suffix array is a single-machine index
# while window counting is two hash-partitioned shuffles that scale
# linearly.  K is 15 (not 50) so the sf0.01 fixture corpus, whose
# near-dup docs share ~15-40-token runs, exercises the operator.
SUBSTRING_K = 15


def _window_hashes(t: Column, k: int) -> Column:
    """md5 of every k-token window (stride 1).  md5-of-joined-string
    rather than xxhash64 so the DuckDB oracle computes the identical
    value; the shuffled payload is the 32-char digest, never the window
    text itself."""
    n = F.size(t)
    wins = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, k))),
    )
    return F.when(n >= k, wins).otherwise(F.array().cast("array<string>"))


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage by corpus-duplicated k-token spans: a window
    position is *duplicated* when its window occurs in >= 2 distinct
    documents; a document is flagged when more than half its window
    positions are duplicated.

    Scale shape: windows explode from the tokenize projection (corpus x K
    amplification, but each row is an 8+32-byte pair); ONE groupBy on the
    window hash is the only exchange the postings ever cross — min/max
    doc_id decide ">= 2 distinct docs" and count(*) rides the same
    map-side-partial aggregate, so the per-doc duplicated-position count
    resolves by COMPLEMENT (n_dup = n_windows - positions of single-doc
    windows) on the window-grain table, never by joining the survivors
    back onto the corpus x K postings (the shape text_novelty/text_winnow
    retired: the join-back re-shuffled every posting a second time).
    Within-doc repeats of a single-doc window count as NOT duplicated in
    both forms (distinct-docs == 1 regardless of multiplicity), which is
    why the complement is exact.  Nothing is quadratic and no per-doc
    state exceeds the token count."""
    base = tracked_persist(
        token_docs(spark, sf_dir).select(
            "doc_id",
            F.size("toks").cast("long").alias("n"),
            _window_hashes(F.col("toks"), SUBSTRING_K).alias("wins"),
        )
    )
    pos = base.select("doc_id", F.explode_outer("wins").alias("w")).filter(
        F.col("w").isNotNull()
    )
    # "occurs in >= 2 distinct docs" is exactly min(doc_id) < max(doc_id):
    # plain min/max aggregates keep map-side partials in ONE exchange over
    # the corpus x K postings, and count(*) rides the same aggregate — a
    # window with d0 == d1 lives in exactly one doc (its owner), so its
    # position count credits that owner's NON-duplicated total and
    # n_dup = n_windows - n_uniq, with no join back onto the postings
    uniq_per_doc = (
        pos.groupBy("w")
        .agg(
            F.min("doc_id").alias("d0"),
            F.max("doc_id").alias("d1"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("d0") == F.col("d1"))
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.sum("c").alias("n_uniq"))
    )
    n_windows = F.greatest(F.col("n") - (SUBSTRING_K - 1), F.lit(0).cast("long"))
    n_dup = F.col("n_windows") - F.coalesce(F.col("n_uniq"), F.lit(0).cast("long"))
    return (
        base.select("doc_id", "n", n_windows.alias("n_windows"))
        .join(uniq_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            n_dup.alias("n_dup_windows"),
            F.when(
                F.col("n") >= SUBSTRING_K,
                F.round(n_dup * 1.0 / (F.col("n") - (SUBSTRING_K - 1)), 6),
            ).alias("dup_frac"),
            (n_dup * 2 > F.greatest(F.col("n_windows"), F.lit(1).cast("long"))).alias(
                "flagged"
            ),
        )
    )


def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span REMOVAL (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): where ``dedup_substring`` only
    FLAGS documents by duplicated-window coverage, this operator produces
    the cleaned corpus — every token covered by a k-token window that
    occurs in >= 2 distinct documents is removed from all but the
    canonical first occurrence (min doc_id), and the surviving tokens are
    reassembled in order.

    Scale shape (everything hash-partitioned, nothing quadratic):
    1. one corpus-scale posexplode of window md5s (stride 1, 32-byte
       digests in flight, never window text);
    2. ONE groupBy on the window hash -> (ndocs, owner=min doc_id),
       map-side partial;
    3. duplicated-window occurrences in non-owner docs join back on the
       hash with a SHUFFLE_HASH hint (derived corpus-scale table — the
       broadcast-estimate trap documented on dedup_substring);
    4. covered token positions explode (x K amplification on REMOVED
       occurrences only) -> ONE per-doc position set (collect_set);
    5. rebuild IN-ARRAY: join the position sets back to the token arrays
       on doc_id (one corpus-scale exchange) and filter each array with
       array_except over its position sequence — O(n) per doc, no
       token-grain posexplode, no per-doc sort-aggregate.  Per-doc state
       never exceeds token count.

    Within-document repeats are NOT removed (ndocs counts distinct docs);
    that is ``text_repetition``'s job.  Output: (doc_id, n_tokens,
    n_removed, cleaned_text) for every document, cleaned_text = '' when
    everything was removed."""
    return span_removal_from(token_docs(spark, sf_dir))


def span_removal_from(tok_df: DataFrame) -> DataFrame:
    """Composable core of ``dedup_span_removal`` over any (doc_id, toks)
    frame (the ``_from`` contract shared with triangle_count_from etc.)."""
    base = tracked_persist(
        tok_df.select(
            "doc_id",
            "toks",
            F.size("toks").cast("long").alias("n"),
            _window_hashes(F.col("toks"), SUBSTRING_K).alias("wins"),
        )
    )
    occ = base.select(
        "doc_id", F.posexplode("wins").alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("s"), "w")
    # ">= 2 distinct docs" == min(doc_id) < max(doc_id) (the dup_keys
    # trick): the owner is the min anyway, so the max rides the same
    # single-exchange map-side-partial aggregate and the two-exchange
    # count-distinct rewrite over the corpus x K occurrences disappears
    winners = (
        occ.groupBy("w")
        .agg(F.min("doc_id").alias("owner"), F.max("doc_id").alias("mx"))
        .filter(F.col("owner") < F.col("mx"))
        .select("w", "owner")
    )
    # covered positions collapse to ONE per-doc set (collect_set dedups
    # overlapping windows); per-doc state is bounded by the token count —
    # the same bound the old token-grain rebuild already paid, but the
    # shuffle now carries removed-position ints only, never the corpus's
    # tokens.  (The previous shape posexploded EVERY token, anti-joined on
    # (doc_id, p) and re-sorted each doc with array_sort(collect_list) —
    # two extra corpus-scale exchanges plus a corpus-wide sort-aggregate,
    # all replaced by the in-array rebuild below.)
    removed = (
        occ.join(winners.hint("shuffle_hash"), "w")
        .filter(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + (SUBSTRING_K - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("rm"))
    )
    # in-array rebuild, O(n) per doc: array_except keeps first-array order
    # (ascending positions) and hashes rm once — NOT array_contains per
    # token, which would be O(n * |rm|) on heavily-duplicated docs
    kept_pos = F.array_except(
        F.sequence(F.lit(1).cast("long"), F.col("n")),
        F.coalesce(F.col("rm").cast("array<long>"), F.array().cast("array<long>")),
    )
    kept_toks = F.transform(kept_pos, lambda p: F.element_at(F.col("toks"), p.cast("int")))
    return (
        base.join(removed.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("n") - F.size(kept_pos).cast("long")).alias("n_removed"),
            F.concat_ws(" ", kept_toks).alias("cleaned_text"),
        )
    )


DEDUP_SPAN_REMOVAL_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
),
occ AS (
  SELECT doc_id, i AS s,
         md5(array_to_string(list_slice(t, i, i + {SUBSTRING_K - 1}), ' ')) AS w
  FROM base, LATERAL unnest(generate_series(1, n - {SUBSTRING_K - 1})) AS u(i)
  WHERE n >= {SUBSTRING_K}
),
winners AS (
  SELECT w, min(doc_id) AS owner
  FROM occ GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
removed AS (
  SELECT DISTINCT occ.doc_id, occ.s + o.off AS p
  FROM occ JOIN winners USING (w),
       LATERAL unnest(generate_series(0, {SUBSTRING_K - 1})) AS o(off)
  WHERE occ.doc_id <> winners.owner
),
tok AS (
  SELECT doc_id, i AS p, t[i] AS tok
  FROM base, LATERAL unnest(generate_series(1, n)) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.p, tok.tok
  FROM tok LEFT JOIN removed r ON tok.doc_id = r.doc_id AND tok.p = r.p
  WHERE r.p IS NULL
),
cleaned AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS cleaned_text
  FROM kept GROUP BY 1
)
SELECT b.doc_id, b.n AS n_tokens,
       b.n - coalesce(c.n_kept, 0) AS n_removed,
       coalesce(c.cleaned_text, '') AS cleaned_text
FROM base b LEFT JOIN cleaned c USING (doc_id)
"""


DEDUP_SUBSTRING_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, md5(array_to_string(list_slice(t, i, i + {SUBSTRING_K - 1}), ' ')) AS w
  FROM base, LATERAL unnest(generate_series(1, n - {SUBSTRING_K - 1})) AS u(i)
  WHERE n >= {SUBSTRING_K}
),
nd AS (SELECT w, count(DISTINCT doc_id) AS ndocs FROM pos GROUP BY 1),
dup AS (
  SELECT doc_id, count(*) AS n_dup
  FROM pos JOIN nd USING (w) WHERE nd.ndocs >= 2 GROUP BY 1
)
SELECT b.doc_id,
       greatest(b.n - {SUBSTRING_K - 1}, CAST(0 AS BIGINT)) AS n_windows,
       coalesce(d.n_dup, 0) AS n_dup_windows,
       CASE WHEN b.n >= {SUBSTRING_K}
            THEN round(coalesce(d.n_dup, 0) * 1.0 / (b.n - {SUBSTRING_K - 1}), 6)
       END AS dup_frac,
       coalesce(d.n_dup, 0) * 2 >
         greatest(b.n - {SUBSTRING_K - 1}, CAST(1 AS BIGINT)) AS flagged
FROM base b LEFT JOIN dup d USING (doc_id)
"""


DEDUP_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_substring": (dedup_substring, DEDUP_SUBSTRING_SQL),
    "dedup_span_removal": (dedup_span_removal, DEDUP_SPAN_REMOVAL_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, JACCARD_CAPPED_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_incremental": (dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "dedup_cluster": (dedup_cluster, DEDUP_CLUSTER_SQL),
    "dedup_cluster_star": (dedup_cluster_star, DEDUP_CLUSTER_SQL),
    "dedup_cluster_best": (dedup_cluster_best, _cluster_best_oracle_sql()),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
}
