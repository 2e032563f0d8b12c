"""Incremental perceptual-hash image dedup (streaming/phashmaint.py):
index-first commits, read-back pair computation, exactly-once replays,
and compaction content-identity."""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
    current_version,
    read_snapshot,
    snapshot_files,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.phashmaint import (
    INDEX_TABLE,
    PAIRS_TABLE,
    extend_phash,
    run_phash_stream,
)

# PHASH_GROUP=4: docs 0-3 are one near-dup family (member m toggles m
# bits), 4-7 another; batches split families across arrivals so the
# batch-vs-corpus index probe carries real cross-batch pairs.
B1 = [(0, "a"), (1, "b"), (4, "c")]
B2 = [(2, "d"), (5, "e")]
B3 = [(3, "f"), (6, "g"), (7, "h")]


def _write_batch(src: str, name: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    time.sleep(0.05)


def _pairs(spark, out) -> dict[tuple[int, int], tuple[int, int]]:
    return {
        (r.doc_a, r.doc_b): (r.hamming, r.batch_id)
        for r in read_snapshot(spark, f"{out}/{PAIRS_TABLE}").collect()
    }


def _expected(batches: list[list[tuple[int, str]]]):
    """Ground truth from the fixture's construction: within a group of
    4, Hamming(a, b) = |a%4 - b%4| <= 3, discovered at the later
    endpoint's batch; cross-group md5 patterns never collide."""
    arrival = {}
    for b, docs in enumerate(batches):
        for doc_id, _ in docs:
            arrival[doc_id] = b
    want = {}
    ids = sorted(arrival)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if a // 4 == b // 4:
                want[(a, b)] = (abs(a % 4 - b % 4), max(arrival[a], arrival[b]))
    return want


def test_phash_stream_incremental_and_exactly_once(spark, tmp_path):
    """Three batches splitting two near-dup families: every pair lands
    with the fixture's exact Hamming distance in its later endpoint's
    batch; a mid-stream compaction changes nothing; a replay of batch 0
    (same writer identity) is fenced at both tables."""
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "phash")
    ckpt = str(tmp_path / "ckpt")

    for i, docs in enumerate((B1, B2, B3)):
        _write_batch(src, f"b{i}.json", docs)
    q = run_phash_stream(spark, src, out, ckpt, max_files_per_trigger=1,
                         compact_every=2)
    assert q.awaitTermination(300), "stream did not drain in 300s"

    got = _pairs(spark, out)
    assert got == _expected([B1, B2, B3])

    # compaction ran (batch 1 -> (1+1)%2 == 0) and left few live files
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        _fs as _snap_fs,
        _load_manifest,
    )

    fs, _ = _snap_fs(spark, f"{out}/{INDEX_TABLE}")
    # compaction happened at batch 1; batch 2 appended after, so the
    # current manifest may or may not carry the marker — check v at 1
    found = False
    v = current_version(spark, f"{out}/{INDEX_TABLE}")
    for probe in range(v, 0, -1):
        try:
            m = _load_manifest(spark, fs, f"{out}/{INDEX_TABLE}", probe)
        except Exception:
            continue
        if "compacted_from" in m:
            found = True
            break
    assert found, "no compacted version found in the index table"

    # replay of batch 0 (same writer identity): fenced — no new versions
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in (INDEX_TABLE, PAIRS_TABLE)
    }
    app = "phash-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    extend_phash(
        spark, spark.createDataFrame(B1, ["doc_id", "text"]), out, 0,
        txn_app=app,
    )
    assert _pairs(spark, out) == got
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t


def test_phash_crash_between_commits_replays_clean(spark, tmp_path):
    """Crash window: batch 1's index commit landed but its pairs commit
    did not.  The replay must skip the index append (fenced) and
    recompute the SAME pairs from the index that already contains the
    batch — the read-back protocol's determinism argument."""
    out = str(tmp_path / "phash")
    app = "phash-test"

    extend_phash(
        spark, spark.createDataFrame(B1, ["doc_id", "text"]), out, 0,
        txn_app=app,
    )
    first = _pairs(spark, out)

    # simulate the crash: run batch 1's index append ONLY
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        phash_bands,
        phash_signatures,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        write_snapshot,
    )

    b2 = spark.createDataFrame(B2, ["doc_id", "text"])
    bands = phash_bands(phash_signatures(b2.select("doc_id")))
    write_snapshot(
        spark,
        bands.select("key", "band", "doc_id", "lo", "hi"),
        f"{out}/{INDEX_TABLE}",
        txn_app=app,
        txn_version=1,
        cluster_col="key",
    )
    idx_v = current_version(spark, f"{out}/{INDEX_TABLE}")

    # the replay: full batch-1 body
    extend_phash(spark, b2, out, 1, txn_app=app)
    # index append fenced (no new version), pairs computed and correct
    assert current_version(spark, f"{out}/{INDEX_TABLE}") == idx_v
    got = _pairs(spark, out)
    assert got == _expected([B1, B2])
    assert set(got) - set(first) == {(0, 2), (1, 2), (4, 5)}  # batch-1 pairs


def test_phash_index_probe_reads_pruned_files(spark, tmp_path):
    """The pair probe must read the key-pruned index, not the whole
    table: after two disjoint-key batches, the pruned plan for a batch
    whose keys live in one file range touches fewer files than the
    snapshot holds (manifest-stat skipping on the clustered key)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        phash_bands,
        phash_signatures,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot_pruned,
    )

    out = str(tmp_path / "phash")
    app = "phash-test"
    # one bulk batch (100 groups): the clustered append range-partitions
    # the band rows into many files with narrow key ranges (AQE
    # coalescing disabled during staging so the tiny fixture actually
    # produces them — the annmaint pruning-test precedent)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        extend_phash(
            spark,
            spark.createDataFrame(
                [(i, "x") for i in range(0, 400)], "doc_id long, text string"
            ),
            out, 0, txn_app=app,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    total = len(snapshot_files(spark, f"{out}/{INDEX_TABLE}"))
    assert total > 4, total  # enough files for pruning to mean anything
    probe_keys = [
        r["key"]
        for r in phash_bands(
            phash_signatures(
                spark.createDataFrame([(0,)], "doc_id long")
            )
        ).select("key").collect()
    ]
    pruned = read_snapshot_pruned(spark, f"{out}/{INDEX_TABLE}", probe_keys)
    n_pruned = pruned.inputFiles() if pruned is not None else []
    assert len(n_pruned) < total, (len(n_pruned), total)
