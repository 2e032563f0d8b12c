"""Dedup/text-operator throughput probe at a corpus size where fixed
overhead is noise: N synthetic documents (seeded Spark-side generation —
deterministic token streams with planted near-duplicates and shared
boilerplate spans) through the three heaviest corpus operators:

- MinHash-LSH dedup (profile -> band -> candidate -> verify),
- substring (span-grain) dedup (window hash -> corpus count -> coverage),
- winnowing fingerprints (k-gram hash -> window min -> overlap),
- bigram-LM perplexity scoring (the n-gram join shape: posexplode ->
  unigram/bigram count joins -> per-doc mean NLL; the model tables are
  trained ONCE outside the timer — the artifact operating model).

The sf0.1 bench corpus is 5k docs — small enough that JVM fixed costs
dominate; this probe runs at 50k+ docs and reports docs/s per operator,
the scaling evidence BASELINE.md cites for the text family.  Generation
happens in the executors (spark.range -> column expressions; the driver
never sees a document).

Usage: python tools/dedup_scale_probe.py [N] [runs] [only_op[,only_op...]]
Prints one JSON line: {"n_docs": ..., "cores": ..., "ops": {name:
{"best_sec": ..., "docs_per_sec": ...}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = 500  # small vocabulary -> realistic shingle collisions
DOC_TOKENS = 60
NEARDUP_EVERY = 10  # every 10th doc is a near-copy of its predecessor
BOILER_EVERY = 7  # every 7th doc embeds the shared 20-token span


def synthetic_docs(spark, n: int):
    """(doc_id, text): deterministic token streams; near-dups and planted
    boilerplate give the operators real signal at any scale."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("doc_id") * 1000 + i), F.lit(VOCAB)),
    )
    # near-dup: doc 10k+1 copies doc 10k's stream except the last token
    src = F.when(
        F.col("doc_id") % NEARDUP_EVERY == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    tok_src = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(src * 1000 + i), F.lit(VOCAB))
    )
    body = F.concat_ws(" ", *[tok_src(i) for i in range(DOC_TOKENS - 1)], tok(999))
    boiler = " ".join(f"boiler{i}" for i in range(20))
    text = F.when(
        F.col("doc_id") % BOILER_EVERY == 0,
        F.concat(F.lit(boiler + " "), body),
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        _window_hashes,
        lsh_bands,
        lsh_candidates,
        minhash_profiles,
        postings_of,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        fingerprints_of,
        score_lm,
        train_lm_model,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    from pyspark.sql import functions as F

    spark = get_spark()
    docs = synthetic_docs(spark, n)
    docs.write.mode("overwrite").parquet(f"/tmp/dedup_probe_corpus_{n}")
    corpus = spark.read.parquet(f"/tmp/dedup_probe_corpus_{n}")
    toks = corpus.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )

    def run_minhash():
        # bucket-capped candidate generation (lsh_candidates): all-pairs
        # in small buckets, star-to-min in boilerplate-blown ones — the
        # operator's production path
        profiles = minhash_profiles(postings_of(corpus))
        return lsh_candidates(lsh_bands(profiles)).count()

    def run_substring():
        base = toks.select(
            "doc_id", _window_hashes(F.col("toks"), SUBSTRING_K).alias("wins")
        )
        pos = base.select("doc_id", F.explode("wins").alias("w"))
        nd = (
            pos.groupBy("w")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
        )
        # shuffle_hash mirrors the operator: the survivor side is derived
        # data whose static estimate must never pick a broadcast
        return (
            pos.join(nd.select("w").hint("shuffle_hash"), "w")
            .groupBy("doc_id")
            .count()
            .count()
        )

    def run_span_removal():
        # the full ExactSubstr transform: winner detection + covered-
        # position rebuild + ordered re-aggregation of the cleaned text
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
            span_removal_from,
        )
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
            release_tracked_caches,
        )

        out = span_removal_from(toks).agg(F.sum("n_removed")).collect()[0][0]
        release_tracked_caches()
        return out

    def run_winnow():
        fp = fingerprints_of(toks)
        nd = fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("nd"))
        return (
            fp.join(nd.hint("shuffle_hash"), "fp").groupBy("doc_id").count().count()
        )

    lm_path = f"/tmp/dedup_probe_lm_model_{n}"
    train_lm_model(spark, corpus, lm_path)  # model state: trained once

    def run_lm_score():
        return (
            score_lm(corpus, spark, lm_path)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )

    def run_cluster():
        # minhash-LSH pairs -> iterative min-label propagation: the
        # probe's planted near-dups give ~n/10 two-vertex components,
        # so this measures the CC machinery (per-round shuffle + count
        # + localCheckpoint) at pair-graph scale, not graph diameter
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
            connected_components,
        )

        profiles = minhash_profiles(postings_of(corpus))
        pairs = lsh_candidates(lsh_bands(profiles)).selectExpr(
            "doc_a AS src", "doc_b AS dst"
        )
        edges = pairs.union(pairs.selectExpr("dst AS src", "src AS dst"))
        return connected_components(edges).groupBy("cluster_rep").count().count()

    def run_bpe_train():
        # full 8-round BPE training: the corpus-scale word count plus 8
        # bounded-vocabulary merge rounds (pair count + argmax + fold) —
        # the Heap's-law collapse is what this measures at scale
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.bpe import (
            train_bpe,
        )
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
            release_tracked_caches,
        )

        merges, _ = train_bpe(spark, corpus)
        release_tracked_caches()
        return len(merges)

    def run_phash():
        # perceptual-hash image dedup end-to-end: PNG synth -> stdlib
        # decode -> integer aHash (two Arrow passes), then the banded
        # Hamming bucket join.  The fixture formula gives distinct
        # hashes per group (realistic buckets), so this measures the
        # Python decode boundary + LSH join shape at corpus scale.
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
            phash_pairs_from,
        )
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
            release_tracked_caches,
        )

        out = phash_pairs_from(corpus.select("doc_id")).count()
        release_tracked_caches()
        return out

    def run_vframes():
        # frame-level video near-dup at corpus scale.  The fixture's
        # frame pattern has only 256 distinct classes, so at probe
        # scale EVERY class carries thousands of videos and crosses
        # FRAME_DF_CAP — an all-boilerplate corpus, the worst case the
        # cap exists for: without it the pair join is (n/256)^2 * 256;
        # with it the run stays linear (hash + class agg + empty join).
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
            video_frame_pairs_from,
        )
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
            release_tracked_caches,
        )

        out = video_frame_pairs_from(corpus.select("doc_id")).count()
        release_tracked_caches()
        return out

    ops = {
        "minhash_lsh": run_minhash,
        "substring": run_substring,
        "span_removal": run_span_removal,
        "winnow": run_winnow,
        "bigram_lm_score": run_lm_score,
        "cc_cluster": run_cluster,
        "bpe_train": run_bpe_train,
        "phash": run_phash,
        "vframes": run_vframes,
    }
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        ops = {k: v for k, v in ops.items() if k in only}
    out = {}
    for name, fn in ops.items():
        fn()  # warmup (codegen JIT)
        best = min(_timed(fn) for _ in range(runs))
        out[name] = {"best_sec": round(best, 2), "docs_per_sec": int(n / best)}
    print(json.dumps({"n_docs": n, "cores": cpus, "ops": out}))


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
