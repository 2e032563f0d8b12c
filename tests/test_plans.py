"""Physical-plan regression tests: the scale properties the engine is
designed around (broadcast dims, parquet filter pushdown, no cartesian
blowups) must survive refactors — a correct-but-shuffle-heavy plan is a
regression even when results match."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.skew import (
    salted_join,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
    load_table,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_to_scan(spark, sf_dir):
    plan = _formatted(q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_comment" not in plan


def test_q3_broadcasts_dims(spark, sf_dir):
    plan = _formatted(q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every base filter is pushed
    assert plan.count("PushedFilters: [") >= 3
    assert "PushedFilters: []" not in plan


def test_q5_no_shuffle_for_dims(spark, sf_dir):
    plan = _formatted(q5_local_supplier_volume(spark, sf_dir))
    # nation/region/supplier/customer all broadcast; only the fact-fact
    # join may shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    build = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(build, "o_custkey").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in salted_join(orders, build, "o_custkey", salt_n=8).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_scatters_hot_key(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    hot = orders.withColumn("o_custkey", F.lit(7))  # everything one key
    build = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
        .filter(F.col("o_custkey") == 7)
    )
    joined = salted_join(hot, build, "o_custkey", salt_n=8)
    # the probe side fans the hot key across all 8 salt buckets
    p = hot.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8)).cast("int"),
    )
    n_buckets = p.select("_salt").distinct().count()
    assert n_buckets == 8
    assert joined.count() == hot.count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key lets the sort-merge join
    read co-located buckets with NO exchange on either side — the
    pre-shuffled layout a 100 TB lineitem x orders join would use."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", li, "l_orderkey"),
    ):
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        # hint("merge"): at test scale the optimizer would broadcast the
        # small side; at 100 TB neither side broadcasts and the SMJ path
        # under test here is the one that runs
        j = spark.table("b_lineitem").hint("merge").join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _formatted(j)
        assert "Exchange" not in plan, plan[:800]
        n = j.count()
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_runtime_bloom_filter_join(spark, sf_dir):
    """A selective dim-side filter injects a runtime Bloom filter on the
    fact side of a shuffle join (Spark's runtime row-level filtering) —
    at 100 TB this prunes fact rows BEFORE the shuffle instead of after
    the join.  Local data sits under the default creation-side threshold,
    so the test pins the behavior with the thresholds lowered."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # application side must LOOK big (scan-size floor), creation side
        # must stay under its 10MB ceiling (default holds at test scale)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:1200]
        # and the filtered join still answers correctly
        assert j.count() > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_clustered_layout_skips_row_groups(spark, tmp_path):
    """write_clustered (range-partition + sort on the filter key) gives
    each parquet row group a narrow min/max on that key, so a pushed
    point predicate skips whole row groups: the FileSourceScan's
    numOutputRows is a fraction of the unsorted layout's (which must
    surface every row group to the post-scan filter)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.layout import (
        write_clustered,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    clustered = str(tmp_path / "clustered")
    unsorted = str(tmp_path / "unsorted")
    write_clustered(li, clustered, "l_partkey", n_files=8)
    li.repartition(8).write.parquet(unsorted)

    def scan_rows(path):
        df = (
            spark.read.parquet(path)
            .filter(F.col("l_partkey") == 777)
            .select("l_partkey", "l_quantity")
        )
        res = df.collect()
        scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return len(res), scan.metrics().apply("numOutputRows").value()

    total = li.count()
    rows_c, scanned_c = scan_rows(clustered)
    rows_u, scanned_u = scan_rows(unsorted)
    assert rows_c == rows_u  # same answer from both layouts
    assert scanned_u == total  # unsorted: no row group is skippable
    assert scanned_c * 4 <= total  # clustered: most row groups skipped


@pytest.mark.slow
def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """write_zordered (interleaved-bit key over two columns) narrows every
    row group's min/max on BOTH columns: a pushed point predicate on
    either one skips row groups, where single-column clustering only
    serves its own key and scans everything for the other."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.layout import (
        write_clustered,
        write_zordered,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    zordered = str(tmp_path / "zordered")
    clustered = str(tmp_path / "clustered")
    write_zordered(li, zordered, ["l_partkey", "l_suppkey"], n_files=64)
    write_clustered(li, clustered, "l_partkey", n_files=64)

    def scan_rows(path, col, val):
        df = (
            spark.read.parquet(path)
            .filter(F.col(col) == val)
            .select(col, "l_quantity")
        )
        res = df.collect()
        scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return len(res), scan.metrics().apply("numOutputRows").value()

    total = li.count()
    for col, val in (("l_partkey", 777), ("l_suppkey", 42)):
        rows_z, scanned_z = scan_rows(zordered, col, val)
        rows_c, scanned_c = scan_rows(clustered, col, val)
        assert rows_z == rows_c  # same answer from both layouts
        # z-order: meaningful skipping on EITHER filter column
        assert scanned_z * 2 <= total, (col, scanned_z, total)
    # the single-column layout cannot skip on the non-cluster column
    _, scanned_other = scan_rows(clustered, "l_suppkey", 42)
    assert scanned_other == total


def test_contamination_broadcasts_benchmark_set(spark, sf_dir):
    """The benchmark shingle set must broadcast (a real eval suite is MBs
    vs a 100 TB corpus); the corpus side takes exactly one aggregation
    exchange and never self-joins."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_contamination,
    )

    plan = _formatted(text_contamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sq8_first_pass_carries_codes_only(spark, sf_dir):
    """The quantized scan's nested-loop join must broadcast the query
    side, and the full-precision vectors (u) must NOT flow through the
    stage-1 window exchange — only ids + integer scores do."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_sq8,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(ann_topk_sq8(spark, sf_dir))
    release_tracked_caches()
    assert "BroadcastNestedLoopJoin" in plan
    # stage-1 window sorts (query_id, qscore, neighbor_id) rows only: the
    # window operator's required sort must not mention the vector column
    win = [ln for ln in plan.splitlines() if "Window" in ln or "qscore" in ln]
    assert any("qscore" in ln for ln in win)


def test_mix_sampler_never_shuffles_corpus(spark, sf_dir):
    """Both sampler aggregates are per-source (tiny); the doc-grain side
    is cached and re-filtered, never joined shuffle-to-shuffle: every
    join in the plan is a broadcast."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_mix_sources,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_mix_sources(spark, sf_dir))
    release_tracked_caches()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_substring_dedup_plan_shape(spark, sf_dir):
    """dedup_substring: no quadratic operator anywhere; the window-count
    aggregation runs with map-side partial aggregation (two HashAggregate
    levels around its exchange) so hot boilerplate windows combine before
    the shuffle."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        dedup_substring,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(dedup_substring(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # distinct-doc counting = partial_count(distinct ...) with a partial
    # aggregate below the exchange
    assert "partial_count" in plan


def test_winnow_plan_no_quadratic_and_partial_agg(spark, sf_dir):
    """text_winnow: fingerprint counting and the join back are both keyed
    on the fingerprint hash — never a cross product; per-doc aggregation
    keeps map-side partials."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_winnow,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(text_winnow(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_repetition_single_scan_single_gram_shuffle(spark, sf_dir):
    """text_repetition: unigrams/bigrams/trigrams ride ONE explode from
    one scan (no union of three scans), and hashpartitioning(doc_id) from
    the spread satisfies BOTH groupBys — the gram-grain count and the
    per-doc rollup aggregate with zero additional exchanges."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_repetition,
    )

    plan = _formatted(text_repetition(spark, sf_dir))
    # one scan (one Location detail block); the only exchange is the doc
    # spread — Catalyst inserts no ENSURE_REQUIREMENTS exchange because
    # hashpartitioning(doc_id) already satisfies both groupBys
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_ivf_sq8_stage1_is_cell_equijoin_on_codes(spark, sf_dir):
    """IVF-SQ8's stage-1 must be an equi-join on the cell key (the
    partition-pruned probe), never a cross product; the full-precision
    vectors (u) must not flow through the stage-1 ranking exchange —
    only ids + int8 codes do."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_ivf_sq8,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(ann_topk_ivf_sq8(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the probe join is an equi-join keyed on the cell id (partition
    # pruning at scale), not an all-pairs scan like plain SQ8's stage 1
    assert "Left keys [1]: [cell" in plan or "[cell#" in plan.split("Join")[1]


def test_pack_sequences_no_single_partition_sort(spark, sf_dir):
    """corpus_pack_sequences must run as the range-partitioned two-pass
    prefix sum — never the naive global window whose SinglePartition
    exchange is a one-reducer bottleneck at corpus scale."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_pack_sequences,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_pack_sequences(spark, sf_dir))
    release_tracked_caches()
    assert "SinglePartition" not in plan
    assert "rangepartitioning(doc_id" in plan


def test_resample_window_runs_on_grid_not_facts(spark, sf_dir):
    """events_resample_locf: the fact table is touched by exactly one
    aggregation; the LOCF window runs over the dense (type, slot) grid
    (types x slots rows), and the span/type frames broadcast into the
    grid build — no cartesian blowup, no window over raw events."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        events_resample_locf,
    )

    plan = _formatted(events_resample_locf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the 1-row span frame broadcasts (explicit F.broadcast)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exactly one Window operator, above the grid join, keyed per type
    assert plan.count("Window") >= 1
    assert "partial_count" in plan  # the fact agg partial-aggregates


@pytest.mark.slow
def test_pq_stage1_broadcasts_query_lut(spark, sf_dir):
    """PQ's ADC scan joins the 20-row (query, LUT) side to the code
    table via a broadcast nested-loop — the big side carries only ids +
    small int codes; and the exact rerank never cross-joins (candidate
    list drives equi-joins)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_pq,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(ann_topk_pq(spark, sf_dir))
    release_tracked_caches()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the ADC stage ranks on the LUT-sum score
    assert "qscore" in plan


def test_dedup_semantic_joins_on_cell_only(spark, sf_dir):
    """SemDeDup's pair generation must be an equi-join on the cell key —
    never a corpus-wide cartesian/nested-loop product.  (Within-cell
    pairs are the algorithm's intended quadratic, bounded by quantizer
    granularity.)"""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        dedup_semantic,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(dedup_semantic(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan


def test_cm_topk_plan_uses_takeordered(spark, sf_dir):
    """CM heavy hitters must select candidates via TakeOrderedAndProject
    (per-partition heaps), never a SinglePartition sort of every user."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.sketches import (
        cm_topk,
    )

    plan = _formatted(cm_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_dsir_plan_shapes(spark, sf_dir):
    """DSIR: selection threshold via TakeOrdered top-k (no global sort);
    the bucket log-ratio table broadcast onto the token stream."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_dsir_resample,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_dsir_resample(spark, sf_dir))
    release_tracked_caches()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 1  # ratio table broadcast


def test_phrase_mining_plan_uses_takeordered(spark, sf_dir):
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_phrase_mining,
    )

    plan = _formatted(text_phrase_mining(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_ewma_plan_no_cartesian(spark, sf_dir):
    """The EWMA look-back is a type-keyed self-join with a slot band —
    never a cartesian product; the fold runs over collected structs."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        events_ewma_anomaly,
    )

    plan = _formatted(events_ewma_anomaly(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_plan_broadcast_joins_no_single_partition(spark, sf_dir):
    """The n-gram scorer's model joins stay broadcast at small-model
    scale (no sort-merge over the exploded positions), the final
    aggregate partially aggregates map-side, and no stage runs
    SinglePartition except the broadcast scalar exchange."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_lm_score_trigram,
    )

    plan = _formatted(text_lm_score_trigram(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # uni + big + tri
    assert "partial_count" in plan or "HashAggregate" in plan
    # the exploded positions never funnel through one partition: the only
    # SinglePartition exchanges are the broadcast/scalar builds
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            raise AssertionError(f"unexpected SinglePartition exchange: {line}")


def test_cluster_best_window_partitions_on_cluster(spark, sf_dir):
    """Survivor ranking runs per cluster_rep (pair-graph vertices), not
    as a global single-partition sort."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        dedup_cluster_best,
    )

    plan = _formatted(dedup_cluster_best(spark, sf_dir))
    assert "row_number" in plan
    # the rank window's required distribution is the cluster key
    assert "hashpartitioning(cluster_rep" in plan
    assert "Exchange SinglePartition" not in plan


def test_rp_projection_is_shuffle_free_single_projection(spark, sf_dir):
    """The JL projection must compile to a pure map over the scan: no
    Exchange of the data, no UDF -- the K x DIM sign matrix lives as plan
    literals inside one codegen projection."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        embedding_project_rp,
    )

    df = embedding_project_rp(spark, sf_dir)
    plan = _formatted(df)
    # the only allowed Exchange is the spread() round-robin repartition
    # (a local-test fan-out, not a key shuffle)
    assert "hashpartitioning" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_ann_stage1_windows_get_window_group_limit(spark, sf_dir):
    """The compressed-scan ANN variants rank stage-1 candidates with
    `row_number() <= CAND` windows; Spark 4.1's WindowGroupLimit rewrite
    must apply in Partial mode (per-input-partition top-k heaps BEFORE
    the shuffle) so only ~CAND rows per (partition x query) ever move.
    A refactor that breaks rewrite eligibility (e.g. a second window
    function in the same spec) would silently reintroduce full per-query
    partition sorts at 100 TB — pin it."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_ivf_pq,
        ann_topk_ivf_sq8,
        ann_topk_pq,
        ann_topk_rp,
        ann_topk_sq8,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    import re

    # Full-scan stage-1 (broadcast query side over an unpartitioned
    # corpus scan): the rank filter MUST split into a Partial heap below
    # the query_id shuffle + Final above it.
    for fn in (ann_topk_sq8, ann_topk_pq, ann_topk_rp):
        plan = _formatted(fn(spark, sf_dir))
        release_tracked_caches()
        assert re.search(r"row_number\(\), \d+, Partial", plan), (
            f"{fn.__name__}: stage-1 window lost its Partial-mode "
            f"pre-shuffle heap\n{plan[:1500]}"
        )
        assert re.search(r"row_number\(\), \d+, Final", plan), (
            f"{fn.__name__}: Final mode missing"
        )

    # IVF variants: the probe-side nprobe window already shuffled by
    # query_id, so stage-1 arrives co-partitioned and Spark plans a
    # Final-only WindowGroupLimit with NO new Exchange — the group-limit
    # heap must still be there (a plain Window would buffer every
    # candidate row per query before filtering).
    for fn in (ann_topk_ivf_sq8, ann_topk_ivf_pq):
        plan = _formatted(fn(spark, sf_dir))
        release_tracked_caches()
        assert re.search(r"row_number\(\), \d+, Final", plan), (
            f"{fn.__name__}: WindowGroupLimit heap missing\n{plan[:1500]}"
        )


def test_tfidf_plan_group_limit_heap(spark, sf_dir):
    """text_tfidf_keywords' per-doc top-3 must get the WindowGroupLimit
    Partial heap (per-partition top-k BEFORE the doc_id shuffle) and the
    corpus-size scalar must ride a broadcast — no CartesianProduct."""
    import re

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_tfidf_keywords,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(text_tfidf_keywords(spark, sf_dir))
    release_tracked_caches()
    assert re.search(r"row_number\(\), \d+, Partial", plan), plan[:1500]
    assert re.search(r"row_number\(\), \d+, Final", plan)
    assert "CartesianProduct" not in plan


def test_filtered_ann_plan_predicate_and_heap(spark, sf_dir):
    """ann_topk_filtered: the metadata predicate must appear as a Filter
    on the posting side (BEFORE the cell join — at scale it row-group
    skips on the scan), and the rank filter keeps its WindowGroupLimit
    heap; no CartesianProduct."""
    import re

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_filtered,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(ann_topk_filtered(spark, sf_dir))
    release_tracked_caches()
    # formatted mode carries the predicate in the node-details section
    assert re.search(r"Condition[^\n]*label#\d+ % 2", plan), plan[:1500]
    assert re.search(r"row_number\(\), \d+, Final", plan)
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_plan_shapes(spark, sf_dir):
    """ann_hybrid_rrf: each leg and the final cut must end in
    TakeOrderedAndProject (per-partition heaps — no global sort of
    corpus-size data); the only nested-loop joins are the broadcast
    1-row scalar/query-vector attaches; no CartesianProduct."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_hybrid_rrf,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(ann_hybrid_rrf(spark, sf_dir))
    release_tracked_caches()
    assert plan.count("TakeOrderedAndProject") >= 3, plan[:1500]
    assert "CartesianProduct" not in plan


def test_triangle_count_plan_oriented_no_broadcast_of_derived(spark, sf_dir):
    """Triangle closing joins run on shuffle keys: the wedge-closing
    join against the derived pair table is hash-hinted (a post-LSH
    derived table must never ride a plan-time broadcast — its stats
    estimate is unreliable), and nothing degenerates to a cartesian or
    nested-loop join."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        graph_triangle_count,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(graph_triangle_count(spark, sf_dir))
    release_tracked_caches()
    assert "ShuffledHashJoin" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_plan_iterations_stay_on_shuffle_keys(spark, sf_dir):
    """Each power iteration is a key-equi join + partial-aggregated
    groupBy; the corpus-scale rank table is never broadcast (hinted
    shuffle_hash), and no stage collapses to SinglePartition."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        graph_pagerank,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(graph_pagerank(spark, sf_dir))
    release_tracked_caches()
    assert "ShuffledHashJoin" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            raise AssertionError(f"unexpected SinglePartition exchange: {line}")


def test_stratified_sample_plan_group_limit(spark, sf_dir):
    """The per-stratum quota fill must keep its literal rank cap
    WindowGroupLimit-eligible (per-partition top-k heaps before the
    shuffle) — the exact-alloc filter alone would disqualify it."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_sample_stratified,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_sample_stratified(spark, sf_dir))
    release_tracked_caches()
    assert "WindowGroupLimit" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


def test_model_eval_plan_windows_bounded(spark, sf_dir):
    """model_eval_auc's only Window is the cumq prefix over the DISTINCT-
    logit aggregate (bounded by the rounding grid) — a second window
    would mean someone reintroduced a corpus-scale global sort."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        model_eval_auc,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(model_eval_auc(spark, sf_dir))
    release_tracked_caches()
    assert plan.count(") Window\n") == 1, plan[:1500]
    assert "CartesianProduct" not in plan


def test_kcore_plan_semi_joins_on_keys(spark, sf_dir):
    """Each peel round is a degree aggregate + two LeftSemi hash joins on
    vertex keys; survivor sets are derived data and must never ride a
    plan-time broadcast or degenerate to a nested loop."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        graph_kcore,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(graph_kcore(spark, sf_dir))
    release_tracked_caches()
    assert "LeftSemi" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_removal_plan_shape(spark, sf_dir):
    """dedup_span_removal: the corpus-scale derived tables (dup winners,
    removed positions) must ride ShuffledHashJoins — never a plan-time
    broadcast (the derived-stats-estimate trap documented on
    dedup_substring) — and nothing may go quadratic."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        dedup_span_removal,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(dedup_span_removal(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # the rebuild anti-join stays keyed, not broadcast
    assert "BroadcastHashJoin LeftAnti" not in plan


def test_seasonal_naive_plan_keyed_joins_no_window(spark, sf_dir):
    """events_seasonal_naive: the day-ago baseline is an equi self-join
    on (type, slot) — NOT a lag() window partitioned by event_type,
    whose parallelism is capped at the handful of types — and both
    grain-table joins ride ShuffledHashJoin (the derived (type, slot)
    grain is unbounded, so a plan-time broadcast of it is the
    OOM-at-scale pattern).  The only nested-loop join is the broadcast
    1-row (lo, hi) span attach."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        events_seasonal_naive,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(events_seasonal_naive(spark, sf_dir))
    release_tracked_caches()
    assert plan.count("ShuffledHashJoin") >= 2, plan[:1500]
    assert "Window" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    # ONE BNLJ node (the span attach): formatted output prints every
    # node twice — once in the tree, once in the details section
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan[:1500]


def test_percentiles_exact_plan_sorts_grain_not_facts(spark, sf_dir):
    """profile_percentiles_exact: the cumulative window's sort input is
    the (flag, cents) HISTOGRAM GRAIN — the fact table must collapse
    through a map-side partial count BEFORE any Sort/Window (exact
    quantiles at 100 TB sort distinct values, never rows), and the only
    broadcast is the flag-domain totals (bounded by construction)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        profile_percentiles_exact,
    )

    plan = _formatted(profile_percentiles_exact(spark, sf_dir))
    # two Window nodes (tree + details = 4 mentions): the tiny per-flag
    # bucket-prefix window plus the parallel within-(flag, bucket) one
    assert plan.count("Window") == 4, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bulk running sum partitions by (flag, bucket), so its exchange
    # is keyed on both — parallelism scales with buckets, not flags
    assert "hashpartitioning(flag" in plan and "bucket" in plan, plan[:1500]
    # the fact scan reaches a partial_count HashAggregate before the Sort
    tree = plan.split("(1) ")[0]
    assert tree.index("HashAggregate") < tree.index("Sort"), tree


@pytest.mark.slow
def test_triplets_ivf_plan_no_anchor_corpus_cartesian(spark, sf_dir):
    """embedding_triplets_ivf: the negative stage joins anchors to the
    cell-assigned corpus on the CELL key — the anchors x corpus
    cartesian scan of the exact form (its one designed quadratic) must
    not appear anywhere in the scale form's plan."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        embedding_triplets_ivf,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(embedding_triplets_ivf(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_ensemble_plan_ranks_grain_not_docs(spark, sf_dir):
    """text_quality_ensemble: each signal's global rank comes from the
    value-HISTOGRAM grain — the doc scan must collapse through a
    map-side partial count before any Sort/Window, the within-bucket
    running count partitions by bucket (parallelism scales with the
    value domain, not 1), and the rank tables join back shuffle_hash,
    never as plan-time broadcasts of derived tables."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_quality_ensemble,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(text_quality_ensemble(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bulk running count is keyed on the sub-bucket
    assert "hashpartitioning(bucket" in plan, plan[:1500]
    # rank tables (derived, corpus-dependent) attach via shuffle_hash
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # every Window consumes a HashAggregate-collapsed histogram grain:
    # each rank branch is Window <- Sort <- (Exchange) <- HashAggregate,
    # so the plan carries 2 windows and a partial_count per signal —
    # ranks never compute over raw doc rows
    assert plan.count("Window") >= 12  # (tree + details) x 2 windows x 3
    assert plan.count("partial_count") >= 3, plan[:1500]


def test_select_budget_plan_no_corpus_sort(spark, sf_dir):
    """corpus_select_budget: the prefix rule resolves on the (source,
    quality) histogram — the only doc-grain window is the boundary
    tie-group's running sum (partitioned by source AND q_micro), the
    histogram collapses through a partial aggregate, and the status
    table joins back shuffle_hash."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_select_budget,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_select_budget(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # the boundary window is keyed on BOTH source and q_micro — its
    # partition is one quality tie-group, never a whole source
    assert "hashpartitioning(source" in plan and "q_micro" in plan
    # the histogram grain comes from a map-side partial sum
    assert "partial_sum" in plan, plan[:1500]


def test_shard_balance_plan_no_corpus_sort(spark, sf_dir):
    """corpus_shard_balance: the global snake rank decomposes into a
    histogram-grain offset (two-level prefix sum over n_tokens values,
    keyed by sub-bucket) plus a tie-group window keyed by n_tokens —
    doc rows are never globally sorted, and the derived offset table
    attaches via shuffle_hash, not a plan-time broadcast."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_shard_balance,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_shard_balance(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # derived offset table joins back shuffle_hash
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # the tie-group window is keyed on n_tokens AND the hash sub-bucket
    # — its partition is one SLICE of a length tie-group, never the
    # corpus and never a whole tie-group (a fixed-length corpus would
    # otherwise run through one task)
    assert "hashpartitioning(n_tokens" in plan, plan[:1500]
    import re

    value_only = [
        m
        for m in re.findall(r"hashpartitioning\(n_tokens#\d+L?[,)][^)]*\)", plan)
        if "tie#" not in m
    ]
    assert not value_only, value_only
    # the bulk running count is keyed on the histogram sub-bucket
    assert "hashpartitioning(bucket" in plan, plan[:1500]
    # the histogram collapses through a map-side partial count before
    # any Sort/Window touches it
    assert "partial_count" in plan, plan[:1500]


def test_phash_plans_stay_bucketed(spark, sf_dir):
    """dedup_phash / dedup_video_frames: the band candidate join is a
    hash-partitioned equi-join on (band, key) — never a cartesian or
    nested-loop product — and video-frame membership expansion rides
    shuffle_hash (derived data must not plan-time broadcast)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        dedup_phash,
        dedup_video_frames,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    for q in (dedup_phash, dedup_video_frames):
        plan = _formatted(q(spark, sf_dir))
        release_tracked_caches()
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        # the band bucket join keys on band AND key
        assert "band" in plan and "key" in plan, q.__name__
    plan = _formatted(dedup_video_frames(spark, sf_dir))
    release_tracked_caches()
    assert "ShuffledHashJoin" in plan, plan[:1500]


def test_ppl_filter_plan_no_per_lang_corpus_window(spark, sf_dir):
    """text_ppl_filter: the per-lang 70% cut resolves on the
    (lang, nll-bucket) histogram — the only doc-grain window is the
    boundary bucket's rank, keyed by lang AND bucket (one narrow NLL
    slice, never a whole language), and the bucket status joins back
    shuffle_hash."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_ppl_filter,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(text_ppl_filter(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    # (upstream text_lm_score attaches its 1-row (total, vocab) scalar
    # via a designed broadcast nested-loop cross — bounded by
    # construction, so no BNLJ-absence pin here)
    # derived bucket-status table joins back shuffle_hash
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # the histogram grain comes from a map-side partial count
    assert "partial_count" in plan, plan[:1500]
    # every doc-grain rank window is keyed by lang AND _bucket — a
    # row_number over lang alone would put a whole language in one task
    rn_specs = [
        ln
        for ln in plan.splitlines()
        if "row_number()" in ln and "windowspecdefinition(lang#" in ln
    ]
    assert rn_specs, plan[:1500]
    for ln in rn_specs:
        assert "_bucket#" in ln, ln


def test_shuffle_shards_plan_no_corpus_sort(spark, sf_dir):
    """corpus_shuffle_shards: the intra-shard position decomposes into
    a prefix sum over the bounded (shard, bucket) histogram plus a
    row_number inside the (shard, bucket) slice — no doc-grain window
    is ever partitioned by shard alone (a shard is corpus/16, one task
    otherwise), and the derived offsets table attaches shuffle_hash."""
    import re

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_shuffle_shards,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_shuffle_shards(spark, sf_dir))
    release_tracked_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan, plan[:1500]
    # every DOC-GRAIN hashpartitioning on shard also carries bucket: the
    # row_number slice is (shard, bucket), never a whole shard.  The
    # histogram's own prefix-sum window rides the renamed shard_h and is
    # bounded by construction
    shard_only = [
        m
        for m in re.findall(r"hashpartitioning\(shard#\d+L?[,)][^)]*\)", plan)
        if "bucket#" not in m
    ]
    assert not shard_only, shard_only
    assert "hashpartitioning(shard_h" in plan, plan[:1500]
    assert "hashpartitioning(shard" in plan, plan[:1500]
    # the histogram collapses map-side before any Sort/Window
    assert "partial_count" in plan, plan[:1500]


def test_pack_pairing_plan_histogram_grain(spark, sf_dir):
    """corpus_pack_pairing: doc rows collapse to the length histogram
    through a map-side partial count BEFORE any Sort/Window/Join; the
    interval-intersection join runs over the bounded histogram grids
    (a deliberate nested-loop over <=V^2 length classes, never doc
    rows)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_pack_pairing,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    plan = _formatted(corpus_pack_pairing(spark, sf_dir))
    release_tracked_caches()
    # doc rows reach the histogram via partial_count (map-side combine)
    assert "partial_count" in plan, plan[:1500]
    # no doc-grain shuffle: every Exchange partitions on the length
    # value n (histogram grain) or is the broadcast of a bounded grid
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^)#]*)", plan)
    for kind, args in exchanges:
        assert (
            kind in ("SinglePartition", "rangepartitioning")
            or "n#" in args
            or kind == "hashpartitioning" and args.startswith("n")
        ), (kind, args)
