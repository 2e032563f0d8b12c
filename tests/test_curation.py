"""Streaming corpus curation (streaming/curation.py): quality gate,
within-batch exact + near dedup, batch-vs-corpus near-dup against the
persisted index, and exactly-once admission across replays."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
    current_version,
    read_snapshot,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.curation import (
    curate_batch,
    run_curation_stream,
)


def _text(prefix: str, n: int = 40) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _neardup(prefix: str, n: int = 40) -> str:
    toks = [f"{prefix}{i}" for i in range(n)]
    toks[-1] = "changed"  # 37/39 common shingles -> jaccard ~0.95
    return " ".join(toks)


def _write_batch(src: str, name: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    time.sleep(0.05)  # distinct file mtimes keep the source's batch order


def _doc_ids(spark, out):
    return sorted(
        r.doc_id for r in read_snapshot(spark, f"{out}/docs").select("doc_id").collect()
    )


@pytest.mark.slow
def test_curation_stream_exactly_once(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 1 keeps, 2 is an exact dup of 1, 3 keeps, 4 fails the
    # token floor, 5 is a within-batch near-dup of 3
    _write_batch(src, "b1.json", [
        (1, _text("alpha")),
        (2, _text("alpha")),
        (3, _text("beta")),
        (4, "too short to pass"),
        (5, _neardup("beta")),
    ])
    q = run_curation_stream(spark, src, out, ckpt)
    assert q.awaitTermination(300), "stream did not drain in 300s"
    assert not q.isActive
    assert _doc_ids(spark, out) == [1, 3]

    # batch 2: 101 is a near-dup of batch-1's doc 1 (must be dropped
    # against the PERSISTED index), 102 is fresh
    _write_batch(src, "b2.json", [
        (101, _neardup("alpha")),
        (102, _text("gamma")),
    ])
    q2 = run_curation_stream(spark, src, out, ckpt)
    assert q2.awaitTermination(300), "stream did not drain in 300s"
    assert _doc_ids(spark, out) == [1, 3, 102]

    # the index advanced with the survivors only
    idx_ids = sorted(
        r.doc_id
        for r in read_snapshot(spark, f"{out}/index/profiles").select("doc_id").collect()
    )
    assert idx_ids == [1, 3, 102]

    # replay of batch 1 (same writer identity, same batch_id): every
    # commit is fenced by the txn mark -> nothing admitted twice, no new
    # versions on any table
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in ("docs", "index/bands", "index/profiles")
    }
    import hashlib

    app = "curate-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.createDataFrame(
        [(1, _text("alpha")), (3, _text("beta"))], ["doc_id", "text"]
    )
    curate_batch(spark, replay, out, 0, txn_app=app)
    assert _doc_ids(spark, out) == [1, 3, 102]
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t

    # restart with no new files: nothing reprocessed
    q3 = run_curation_stream(spark, src, out, ckpt)
    assert q3.awaitTermination(120), "stream did not drain in 120s"
    assert _doc_ids(spark, out) == [1, 3, 102]


@pytest.mark.slow
def test_graph_stream_incremental_and_exactly_once(spark, tmp_path):
    """Incremental pair-graph maintenance (streaming/graphmaint.py):
    each micro-batch appends exactly its new edges — within-batch pairs
    plus batch-vs-corpus pairs probed against the persisted band index —
    stamped with the discovering batch; replays are fenced; and the
    accumulated edge set equals the one-shot pair set over the union
    corpus."""
    import hashlib

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.graphmaint import (
        extend_pair_graph,
        run_graph_stream,
    )

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")

    def _pairs():
        return sorted(
            (r.doc_a, r.doc_b, r.batch_id)
            for r in read_snapshot(spark, f"{out}/pairs").collect()
        )

    # batch 1: (1, 2) are near-dups -> one within-batch edge
    _write_batch(src, "b1.json", [
        (1, _text("alpha")),
        (2, _neardup("alpha")),
        (3, _text("beta")),
    ])
    q = run_graph_stream(spark, src, out, ckpt)
    assert q.awaitTermination(300), "stream did not drain in 300s"
    assert not q.isActive
    assert _pairs() == [(1, 2, 0)]

    # batch 2: 101 near-dups batch-1's doc 3 (found via the PERSISTED
    # band index, stamped with the discovering batch), 102 is fresh
    _write_batch(src, "b2.json", [
        (101, _neardup("beta")),
        (102, _text("gamma")),
    ])
    q2 = run_graph_stream(spark, src, out, ckpt)
    assert q2.awaitTermination(300), "stream did not drain in 300s"
    assert _pairs() == [(1, 2, 0), (3, 101, 1)]

    # the index holds ALL docs (the graph keeps every vertex — no
    # curation drop), so future batches can match any of them
    idx_ids = sorted(
        r.doc_id
        for r in read_snapshot(spark, f"{out}/index/profiles")
        .select("doc_id")
        .collect()
    )
    assert idx_ids == [1, 2, 3, 101, 102]

    # replay of batch 0 (same writer identity, same batch_id): every
    # commit is fenced by the txn mark -> no duplicate edges, no new
    # versions on any table
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in ("pairs", "index/bands", "index/profiles")
    }
    app = "graphmaint-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.createDataFrame(
        [(1, _text("alpha")), (2, _neardup("alpha")), (3, _text("beta"))],
        ["doc_id", "text"],
    )
    extend_pair_graph(spark, replay, out, 0, txn_app=app)
    assert _pairs() == [(1, 2, 0), (3, 101, 1)]
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t

    # accumulated edges == the one-shot pair set over the union corpus
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        lsh_bands,
        lsh_candidates,
        minhash_profiles,
        postings_of,
    )
    from pyspark.sql import functions as F

    union = spark.createDataFrame(
        [
            (1, _text("alpha")),
            (2, _neardup("alpha")),
            (3, _text("beta")),
            (101, _neardup("beta")),
            (102, _text("gamma")),
        ],
        ["doc_id", "text"],
    )
    profiles = minhash_profiles(postings_of(union)).persist()
    cand = lsh_candidates(lsh_bands(profiles))
    sh = profiles.select("doc_id", "shingles")
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    oneshot = sorted(
        (r.doc_a, r.doc_b)
        for r in cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .filter(F.round(jac, 4) >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    )
    profiles.unpersist()
    assert [(a, b) for a, b, _ in _pairs()] == oneshot


# --------------------------------------------------------------------- #
# streaming sequence packing (streaming/packing.py)
# --------------------------------------------------------------------- #
def test_packing_stream_continuous_and_exactly_once(spark, tmp_path):
    """Streamed packing must (a) continue the token stream across
    micro-batches — assignments equal the batch operator over the
    concatenated corpus — and (b) replay idempotently: re-running a batch
    leaves the packed table and the running total untouched."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        pack_assignments,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.packing import (
        pack_batch,
        run_packing_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [(i, _text(f"a{i}_", 30 + i)) for i in range(5)]
    batch2 = [(i, _text(f"b{i}_", 25 + i)) for i in range(5, 10)]
    _write_batch(src, "f0.json", batch1)
    _write_batch(src, "f1.json", batch2)

    q = run_packing_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    assert q.awaitTermination(120), "stream did not drain in 120s"

    packed = read_snapshot(spark, f"{out}/packed")
    got = {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in packed.collect()
    }
    # batch twin over the concatenated corpus (same doc order)
    union = spark.createDataFrame(batch1 + batch2, ["doc_id", "text"]).select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens")
    )
    golden = {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in pack_assignments(union).collect()
    }
    assert got == golden and len(got) == 10

    state = read_snapshot(spark, f"{out}/state").collect()
    assert len(state) == 1
    total = sum(v[0] for v in golden.values())
    assert state[0]["total_tokens"] == total

    # replay the LAST batch directly (crash-after-commit): both commits
    # skip on the txn mark; nothing changes
    import hashlib as _h

    app = "pack-" + _h.md5(ckpt.encode()).hexdigest()[:12]
    v_packed = current_version(spark, f"{out}/packed")
    v_state = current_version(spark, f"{out}/state")
    replay = spark.createDataFrame(batch2, ["doc_id", "text"])
    pack_batch(spark, replay, out, 1, txn_app=app)
    assert current_version(spark, f"{out}/packed") == v_packed
    assert current_version(spark, f"{out}/state") == v_state
    assert read_snapshot(spark, f"{out}/packed").count() == 10

    # a replayed batch that died between the two commits re-derives the
    # same rows against the OLD state; only the state commit advances
    batch3 = [(i, _text(f"c{i}_", 20)) for i in range(10, 12)]
    df3 = spark.createDataFrame(batch3, ["doc_id", "text"])
    pack_batch(spark, df3, out, 2, txn_app=app)
    after_once = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in read_snapshot(spark, f"{out}/packed").collect()
    }
    pack_batch(spark, df3, out, 2, txn_app=app)  # full replay
    after_twice = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in read_snapshot(spark, f"{out}/packed").collect()
    }
    assert after_once == after_twice and len(after_twice) == 12


def test_pack_assignments_partition_count_independent(spark):
    """The two-pass prefix sum must yield IDENTICAL assignments under any
    partition count (range partitioning on doc_id + exclusive offsets
    make the global cumulative sum exact under any split) — the property
    that lets a deployment derive the count from input size."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        pack_assignments,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(90)) + 10).alias("n_tokens"),
    )
    runs = {}
    for np_ in (1, 3, 8, 17):
        runs[np_] = {
            r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
            for r in pack_assignments(docs, num_partitions=np_).collect()
        }
    assert runs[1] == runs[3] == runs[8] == runs[17]
    # the default (input-derived) count agrees too
    assert runs[1] == {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in pack_assignments(docs).collect()
    }


def test_packing_stream_restart_with_partition_resize(spark, tmp_path):
    """A packing stream restarted under a DIFFERENT prefix-sum partition
    count (cluster resize between runs) must continue the token stream
    byte-identically: offsets depend only on the running total carried in
    the state snapshot, never on the executor layout."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        pack_assignments,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.packing import (
        run_packing_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [(i, _text(f"a{i}_", 30 + i)) for i in range(6)]
    batch2 = [(i, _text(f"b{i}_", 25 + i)) for i in range(6, 12)]
    _write_batch(src, "f0.json", batch1)

    q1 = run_packing_stream(spark, src, out, ckpt, num_partitions=2)
    assert q1.awaitTermination(120), "stream did not drain in 120s"
    q1.stop()

    import time as _time

    _time.sleep(0.05)
    _write_batch(src, "f1.json", batch2)
    q2 = run_packing_stream(spark, src, out, ckpt, num_partitions=7)
    assert q2.awaitTermination(120), "stream did not drain in 120s"
    q2.stop()

    got = {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in read_snapshot(spark, f"{out}/packed").collect()
    }
    union = spark.createDataFrame(batch1 + batch2, ["doc_id", "text"]).select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    golden = {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in pack_assignments(union).collect()
    }
    assert got == golden and len(got) == 12


def test_span_stream_incremental_and_exactly_once(spark, tmp_path):
    """Incremental span removal (streaming/spanmaint.py): a shared
    15-token span survives in its first-arrived owner and is stripped
    from the later within-batch copy (winner rule) AND from a
    later-batch copy (persisted window index); replays are fenced; and
    the accumulated cleaned rows equal the one-shot batch transform
    over the union corpus."""
    import hashlib

    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        span_removal_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        extend_span_clean,
        run_span_stream,
    )

    span = " ".join(f"s{i}" for i in range(SUBSTRING_K))
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "span")
    ckpt = str(tmp_path / "ckpt")

    def _rows():
        return {
            r.doc_id: (r.n_removed, r.cleaned_text, r.batch_id)
            for r in read_snapshot(spark, f"{out}/cleaned").collect()
        }

    b1 = [
        (1, f"alpha beta {span} gamma"),
        (2, f"intro words {span} outro tail"),
        (3, "totally unrelated words only here"),
    ]
    _write_batch(src, "b1.json", b1)
    q = run_span_stream(spark, src, out, ckpt)
    assert q.awaitTermination(300), "stream did not drain in 300s"
    got = _rows()
    assert got[1] == (0, f"alpha beta {span} gamma", 0)  # batch owner keeps
    assert got[2] == (SUBSTRING_K, "intro words outro tail", 0)
    assert got[3][0] == 0

    # batch 2: the same span arrives again -> stripped via the PERSISTED
    # window index (no batch-internal duplicate this time); this run
    # also exercises the compaction hook (batch_id 1 -> (1+1)%2 == 0)
    b2 = [(101, f"late copy {span} trailing bits")]
    _write_batch(src, "b2.json", b2)
    q2 = run_span_stream(spark, src, out, ckpt, compact_every=2)
    assert q2.awaitTermination(300), "stream did not drain in 300s"
    got = _rows()
    assert got[101] == (SUBSTRING_K, "late copy trailing bits", 1)
    # the due batch compacted both tables: the latest manifests record
    # their source version, and every table collapsed to few files
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        _fs as _snap_fs,
        _load_manifest,
    )

    for t in ("cleaned", "index/windows"):
        fs, _ = _snap_fs(spark, f"{out}/{t}")
        v = current_version(spark, f"{out}/{t}")
        m = _load_manifest(spark, fs, f"{out}/{t}", v)
        assert "compacted_from" in m, t

    # replay of batch 0 (same writer identity, same batch_id): fenced —
    # no duplicate rows, no new versions on either table
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in ("cleaned", "index/windows")
    }
    app = "spanmaint-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.createDataFrame(b1, ["doc_id", "text"])
    extend_span_clean(spark, replay, out, 0, txn_app=app)
    assert len(_rows()) == 4
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t

    # accumulated cleaned rows == the one-shot batch transform over the
    # union corpus
    union = spark.createDataFrame(b1 + b2, ["doc_id", "text"]).select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    batch = {
        r.doc_id: (r.n_removed, r.cleaned_text)
        for r in span_removal_from(union).collect()
    }
    assert {d: v[:2] for d, v in _rows().items()} == batch


def test_span_stream_crash_between_commits_replays_clean(spark, tmp_path):
    """The exactly-once ordering argument, actually exercised: a crash
    AFTER the cleaned commit but BEFORE the window-index commit leaves a
    batch half-published; replaying the whole batch must skip the
    fenced cleaned commit, land the index commit, and end bit-identical
    to the uncrashed run."""
    import hashlib

    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        _window_hashes,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        write_snapshot,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        extend_span_clean,
    )

    span = " ".join(f"s{i}" for i in range(SUBSTRING_K))
    out = str(tmp_path / "span")
    app = "spanmaint-" + hashlib.md5(b"crash").hexdigest()[:12]
    b1 = [(1, f"alpha beta {span} gamma"), (2, f"copy here {span} tail bit")]
    df1 = spark.createDataFrame(b1, ["doc_id", "text"])

    # simulate the crash window: publish ONLY the cleaned table for
    # batch 0 (same writer identity and version the real body would use)
    half = df1.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),  # wrong on purpose: a
        F.lower("text").alias("cleaned_text"),  # fenced replay must NOT fix it
        F.lit(0).alias("batch_id"),
    )
    write_snapshot(spark, half, f"{out}/cleaned", txn_app=app, txn_version=0)

    # replay batch 0 in full: cleaned is fenced (stays as committed),
    # index lands -> the batch's windows become probe-able
    extend_span_clean(spark, df1, out, 0, txn_app=app)
    idx = {r.w for r in read_snapshot(spark, f"{out}/index/windows").collect()}
    assert len(idx) > 0

    # batch 1 reuses the span: rule 1 must strip it via the index the
    # replay published
    df2 = spark.createDataFrame(
        [(101, f"late copy {span} trailing bits")], ["doc_id", "text"]
    )
    extend_span_clean(spark, df2, out, 1, txn_app=app)
    rows = {
        r.doc_id: (r.n_removed, r.cleaned_text)
        for r in read_snapshot(spark, f"{out}/cleaned").collect()
    }
    assert rows[101] == (SUBSTRING_K, "late copy trailing bits")
    # and the fenced batch-0 rows are exactly the pre-crash commit
    assert rows[1][0] == 0 and rows[2][0] == 0


@pytest.mark.slow
def test_spanmaint_trickle_probe_prunes_index_files(spark, tmp_path):
    """After bulk batches build a clustered window index, a TRICKLE
    batch's probe (read_snapshot_pruned over the batch's window hashes)
    plans strictly fewer files than the snapshot holds — and the
    trickle batch's cleaning output is identical to what the full-scan
    probe derives."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
        read_snapshot_pruned,
        snapshot_files,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        CLEAN_TABLE,
        WINDOWS_TABLE,
        extend_span_clean,
    )

    out = str(tmp_path / "span")
    boiler = " ".join(f"b{i}" for i in range(20))  # shared 20-token span
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # two bulk batches; each doc ends with unique filler
        for b in range(2):
            rows = [
                (
                    b * 100 + i,
                    boiler + " " + " ".join(f"u{b}_{i}_{j}" for j in range(30)),
                )
                for i in range(40)
            ]
            extend_span_clean(
                spark,
                spark.createDataFrame(rows, "doc_id long, text string"),
                out,
                b,
                txn_app="t",
            )
        windows_path = f"{out}/{WINDOWS_TABLE}"
        n_files_total = len(snapshot_files(spark, windows_path))
        assert n_files_total >= 8  # clustered files per batch

        # the trickle batch: one doc that repeats the boilerplate plus
        # one novel token -> 7 window hashes against 16+ file ranges
        trickle = [(999, boiler + " tail1")]
        tdf = spark.createDataFrame(trickle, "doc_id long, text string")
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
            SUBSTRING_K,
            _window_hashes,
        )

        keys = [
            r.w
            for r in tdf.select(
                F.explode(
                    _window_hashes(F.split(F.lower("text"), " "), SUBSTRING_K)
                ).alias("w")
            ).collect()
        ]
        pruned = read_snapshot_pruned(spark, windows_path, keys)
        n_files_pruned = (
            pruned.select(F.input_file_name()).distinct().count()
        )
        assert n_files_pruned < n_files_total

        # trickle cleaning (runs through the pruned-probe path) removes
        # exactly the boilerplate span tokens
        extend_span_clean(spark, tdf, out, 2, txn_app="t")
        row = (
            read_snapshot(spark, f"{out}/{CLEAN_TABLE}")
            .filter(F.col("doc_id") == 999)
            .collect()[0]
        )
        assert row.n_removed == 20
        assert row.cleaned_text == "tail1"
    finally:
        spark.conf.unset("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def _write_emb_batch(src, name, rows):
    """rows: (vec_id, label, embedding list[float]) as one NDJSON drop."""
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for vec_id, label, emb in rows:
            f.write(
                json.dumps(
                    {"vec_id": vec_id, "label": label, "embedding": emb}
                )
                + "\n"
            )
    time.sleep(0.05)


@pytest.mark.slow
def test_triplet_stream_incremental_and_exactly_once(spark, tmp_path):
    """Incremental triplet mining (streaming/tripletmaint.py): a new
    anchor is mined in the batch its first pair appears, against the
    corpus as of THAT batch; an already-mined anchor is never re-mined
    even when later batches add positives for it; replays are fenced on
    all three tables."""
    import hashlib as _hashlib

    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.tripletmaint import (
        extend_triplets,
        run_triplet_stream,
    )

    rng = np.random.default_rng(3)

    def vec(base=None, scale=0.02):
        v = rng.normal(size=16) if base is None else base + rng.normal(scale=scale, size=16)
        return [float(x) for x in v]

    d = rng.normal(size=16)
    d /= np.linalg.norm(d)
    # batch 1: anchor 1 and positive 2 (same label, same direction);
    # vectors 3..8 random background (various labels)
    b1 = [(1, 7, vec(d)), (2, 7, vec(d))] + [
        (i, 50 + i, vec()) for i in range(3, 9)
    ]
    # batch 2: vec 20 joins label 7 near d -> NEW pair (1,20) and
    # (2,20) for already-mined anchors 1,2... and 20 itself is only a
    # vec_b (never an anchor); 21 starts a fresh anchor pair with 22
    e = rng.normal(size=16)
    e /= np.linalg.norm(e)
    b2 = [(20, 7, vec(d)), (21, 9, vec(e)), (22, 9, vec(e))]

    src = str(tmp_path / "in")
    out = str(tmp_path / "trip")
    ckpt = str(tmp_path / "ck")
    _write_emb_batch(src, "b1.json", b1)
    q = run_triplet_stream(spark, src, out, ckpt)
    assert q.awaitTermination(300), "stream did not drain in 300s"

    trip1 = {
        r.anchor: (r.negative, r.mined_batch)
        for r in read_snapshot(spark, f"{out}/triplets").collect()
    }
    assert set(trip1) == {1}, trip1  # pair (1,2): anchor=min id only
    assert trip1[1][1] == 0
    neg_b0 = trip1[1][0]
    assert neg_b0 not in (1, 2)  # self and partner excluded
    assert neg_b0 < 9  # mined against batch-0 corpus only

    _write_emb_batch(src, "b2.json", b2)
    q2 = run_triplet_stream(spark, src, out, ckpt)
    assert q2.awaitTermination(300), "stream did not drain in 300s"
    trips = {
        r.anchor: (r.negative, r.mined_batch)
        for r in read_snapshot(spark, f"{out}/triplets").collect()
    }
    # anchor 1 NOT re-mined (still its batch-0 negative); anchor 2's
    # first pair (2,20) arrived in batch 1 -> mined now, with the full
    # corpus (so vec 21/22 are candidates); anchor 21 mined now
    assert trips[1] == (neg_b0, 0)
    assert set(trips) == {1, 2, 21}
    assert trips[2][1] == 1 and trips[21][1] == 1
    # anchor 2's negative must not be its partners (1, 20) or itself
    assert trips[2][0] not in (1, 2, 20)

    pairs = {
        (r.vec_a, r.vec_b): r.batch_id
        for r in read_snapshot(spark, f"{out}/pairs").collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 20)] == 1 and pairs[(2, 20)] == 1
    assert pairs[(21, 22)] == 1

    # replay of batch 0: fenced on all three tables
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in ("pairs", "triplets", "index/cells")
    }
    app = "triplet-" + _hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.createDataFrame(
        b1, "vec_id long, label int, embedding array<float>"
    )
    extend_triplets(spark, replay, out, 0, txn_app=app)
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t


def _write_ann_batch(src, name, rows):
    """rows: (vec_id, embedding list[float]) as one NDJSON drop."""
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
    time.sleep(0.05)


@pytest.mark.slow
def test_ann_stream_maintain_then_serve(spark, tmp_path):
    """Incremental ANN maintenance (streaming/annmaint.py): each batch
    appends its cell assignment and re-serves the FIXED query set
    against the index-so-far; earlier batches' serve rows are immutable
    trajectory evidence; replays are fenced on both tables."""
    import hashlib as _hashlib

    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        TOP_K,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.annmaint import (
        extend_ann_index,
        run_ann_stream,
    )

    rng = np.random.default_rng(11)

    def vec(base=None, scale=0.02):
        v = rng.normal(size=16) if base is None else base + rng.normal(scale=scale, size=16)
        return [float(x) for x in v]

    d = rng.normal(size=16)
    d /= np.linalg.norm(d)
    # batch 1: query 0 points along d; 1..9 random background
    b1 = [(0, vec(d))] + [(i, vec()) for i in range(1, 10)]
    # batch 2: vec 20 lands almost exactly on d -> must become query
    # 0's rank-1 neighbor in the batch-1 serve
    b2 = [(20, vec(d, scale=0.001)), (21, vec()), (22, vec())]

    src = str(tmp_path / "in")
    out = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ck")
    _write_ann_batch(src, "b1.json", b1)
    q = run_ann_stream(spark, src, out, ckpt)
    assert q.awaitTermination(300), "stream did not drain in 300s"

    s0 = read_snapshot(spark, f"{out}/serves").collect()
    assert {r.batch_id for r in s0} == {0}
    assert {r.query_id for r in s0} == set(range(10))  # ids < N_QUERIES present
    by_q = {}
    for r in s0:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) <= TOP_K
        assert all(r.neighbor_id < 10 for r in rows)  # batch-0 corpus only
        assert all(r.neighbor_id != qid for r in rows)  # self excluded

    _write_ann_batch(src, "b2.json", b2)
    q2 = run_ann_stream(spark, src, out, ckpt)
    assert q2.awaitTermination(300), "stream did not drain in 300s"
    serves = read_snapshot(spark, f"{out}/serves").collect()
    s0_after = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in serves
        if r.batch_id == 0
    )
    assert s0_after == sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine) for r in s0
    )  # trajectory immutable
    s1 = [r for r in serves if r.batch_id == 1]
    q0_rank1 = [r for r in s1 if r.query_id == 0 and r.rank == 1]
    assert q0_rank1 and q0_rank1[0].neighbor_id == 20  # new arrival served

    # replay of batch 0: fenced on both tables
    versions = {
        t: current_version(spark, f"{out}/{t}")
        for t in ("serves", "index/cells")
    }
    app = "annmaint-" + _hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.createDataFrame(b1, "vec_id long, embedding array<float>")
    extend_ann_index(spark, replay, out, 0, txn_app=app)
    for t, v in versions.items():
        assert current_version(spark, f"{out}/{t}") == v, t


@pytest.mark.slow
def test_annmaint_serve_read_prunes_index_files(spark, tmp_path):
    """The serve's corpus read plans strictly fewer files than the
    cell-clustered index snapshot holds: the fixed query set's probe
    cells (computed driver-side from the stored model, exactly as
    ``extend_ann_index`` does) hit only their own cell ranges in the
    manifest stats."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ivf_probe_cells,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot_pruned,
        snapshot_files,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.annmaint import (
        INDEX_TABLE,
        _meta_io,
        extend_ann_index,
    )

    rng = np.random.default_rng(7)
    latents = rng.normal(size=(16, 16))
    latents /= np.linalg.norm(latents, axis=1, keepdims=True)

    def rows(lo, hi):
        out = []
        for i in range(lo, hi):
            c = 0 if i < 20 else i % 16  # queries all in latent cluster 0
            v = latents[c] + rng.normal(scale=0.02, size=16)
            out.append((i, [float(x) for x in v]))
        return out

    out = str(tmp_path / "ann")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for b in range(3):
            batch = spark.createDataFrame(
                rows(b * 1000, (b + 1) * 1000),
                "vec_id long, embedding array<float>",
            )
            extend_ann_index(
                spark, batch, out, b, txn_app="t", n_cells=64
            )
        index_path = f"{out}/{INDEX_TABLE}"
        n_total = len(snapshot_files(spark, index_path))
        assert n_total >= 12  # clustered files per batch accumulated

        read_meta, _ = _meta_io(spark, out)
        meta = read_meta()
        cells = sorted(
            {
                c
                for _, qu in meta["queries"]
                for c in ivf_probe_cells(qu, meta["centroids"])
            }
        )
        assert len(cells) < 32  # clustered queries probe few of 64 cells
        pruned = read_snapshot_pruned(spark, index_path, cells)
        n_pruned = len(pruned.inputFiles())
        assert n_pruned < n_total, (n_pruned, n_total)
        # the pruned plan still covers every probed cell's rows
        full = read_snapshot(spark, index_path).filter(
            F.col("cell").isin([int(c) for c in cells])
        )
        assert pruned.filter(
            F.col("cell").isin([int(c) for c in cells])
        ).count() == full.count()
    finally:
        spark.conf.unset("spark.sql.shuffle.partitions")
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")


@pytest.mark.slow
def test_annmaint_drift_triggers_rebuild(spark, tmp_path):
    """Armed with retrain_drift, a batch whose mean assignment
    similarity falls below the stored baseline rebuilds the index on
    corpus ∪ batch (retrain + reassign + one overwrite commit) and
    updates the model state; a non-drifted batch takes the plain append
    path; replays stay fenced on both tables after a rebuild."""
    import hashlib as _hashlib

    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.annmaint import (
        INDEX_TABLE,
        _meta_io,
        extend_ann_index,
    )

    rng = np.random.default_rng(23)
    dirs_a = rng.normal(size=(4, 16))
    dirs_a /= np.linalg.norm(dirs_a, axis=1, keepdims=True)

    def rows(lo, hi, dirs, scale=0.05):
        return [
            (
                i,
                [
                    float(x)
                    for x in dirs[i % len(dirs)]
                    + rng.normal(scale=scale, size=16)
                ],
            )
            for i in range(lo, hi)
        ]

    out = str(tmp_path / "ann")
    app = "annmaint-test"
    # batch 0: tight clusters around dirs_a -> high baseline mean_sim
    extend_ann_index(
        spark,
        spark.createDataFrame(
            rows(0, 400, dirs_a), "vec_id long, embedding array<float>"
        ),
        out,
        0,
        txn_app=app,
        n_cells=8,
        retrain_drift=0.05,
    )
    read_meta, _ = _meta_io(spark, out)
    m0 = read_meta()
    assert m0.get("mean_sim") is not None
    v_idx0 = current_version(spark, f"{out}/{INDEX_TABLE}")

    # batch 1: same distribution -> append path (model unchanged)
    extend_ann_index(
        spark,
        spark.createDataFrame(
            rows(400, 600, dirs_a), "vec_id long, embedding array<float>"
        ),
        out,
        1,
        txn_app=app,
        n_cells=8,
        retrain_drift=0.05,
    )
    m1 = read_meta()
    assert m1["centroids"] == m0["centroids"]

    # batch 2: a NEW distribution (fresh directions) -> drift -> rebuild.
    # Materialized ONCE: the crash-window replay below must feed the
    # byte-identical batch (rows() consumes the rng).
    dirs_b = rng.normal(size=(4, 16))
    dirs_b /= np.linalg.norm(dirs_b, axis=1, keepdims=True)
    b2 = rows(600, 1000, dirs_b)
    extend_ann_index(
        spark,
        spark.createDataFrame(
            b2, "vec_id long, embedding array<float>"
        ),
        out,
        2,
        txn_app=app,
        n_cells=8,
        retrain_drift=0.05,
    )
    m2 = read_meta()
    assert m2["centroids"] != m0["centroids"]  # retrained
    assert m2["queries"] == m0["queries"]  # query set stays frozen
    idx = read_snapshot(spark, f"{out}/{INDEX_TABLE}")
    assert idx.count() == 1000  # overwrite holds corpus ∪ batch exactly once
    # serves exist for every batch incl. the rebuild one
    batches = {
        r.batch_id
        for r in read_snapshot(spark, f"{out}/serves").select("batch_id").collect()
    }
    assert batches == {0, 1, 2}

    # replay of the rebuild batch: fenced (no new versions, meta stable)
    v_serves = current_version(spark, f"{out}/serves")
    v_idx = current_version(spark, f"{out}/{INDEX_TABLE}")
    assert v_idx > v_idx0
    extend_ann_index(
        spark,
        spark.createDataFrame(
            b2, "vec_id long, embedding array<float>"
        ),
        out,
        2,
        txn_app=app,
        n_cells=8,
        retrain_drift=0.05,
    )
    assert current_version(spark, f"{out}/serves") == v_serves
    assert current_version(spark, f"{out}/{INDEX_TABLE}") == v_idx
    assert read_meta()["centroids"] == m2["centroids"]

    # crash window BETWEEN the index overwrite and write_meta: the
    # on-disk meta is still the pre-rebuild model while the committed
    # index already holds corpus ∪ batch.  The replayed batch re-enters
    # the drift branch with prior_full ALREADY containing the batch
    # rows; the set-dedup on vec_id makes the retrain input exactly
    # corpus ∪ batch again, so the replay re-derives the same centroids
    # and baseline instead of training on a duplicated multiset.
    _, write_meta = _meta_io(spark, out)
    write_meta({k: m1[k] for k in ("centroids", "queries", "mean_sim")})
    extend_ann_index(
        spark,
        spark.createDataFrame(
            b2, "vec_id long, embedding array<float>"
        ),
        out,
        2,
        txn_app=app,
        n_cells=8,
        retrain_drift=0.05,
    )
    m_replay = read_meta()
    assert m_replay["centroids"] == m2["centroids"]
    assert m_replay["mean_sim"] == m2["mean_sim"]
    # snapshot commits stayed fenced; the index still holds each vec once
    assert current_version(spark, f"{out}/serves") == v_serves
    assert current_version(spark, f"{out}/{INDEX_TABLE}") == v_idx
    assert read_snapshot(spark, f"{out}/{INDEX_TABLE}").count() == 1000


@pytest.mark.slow
def test_triplet_anchor_with_no_negative_is_never_remined(spark, tmp_path):
    """An anchor whose first-pair batch offers NO admissible negative
    (probed corpus = self + partner only) yields no triplet row — and
    must NOT be re-mined when a later batch adds candidates: mining is
    frozen at the first pair's batch, exactly as the sequential oracle
    replays it (mined-once is keyed on the pairs table, not on triplet
    presence)."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.tripletmaint import (
        extend_triplets,
    )

    rng = np.random.default_rng(31)
    d = rng.normal(size=16)
    d /= np.linalg.norm(d)

    def vec(base, scale=0.01):
        return [float(x) for x in base + rng.normal(scale=scale, size=16)]

    out = str(tmp_path / "trip")
    # batch 0: ONLY the pair (5, 10) — anchor 5 mines against {5, 10},
    # excludes self + partner, finds nothing
    b0 = [(5, 7, vec(d)), (10, 7, vec(d))]
    extend_triplets(
        spark,
        spark.createDataFrame(b0, "vec_id long, label int, embedding array<float>"),
        out, 0, txn_app="t",
    )
    assert current_version(spark, f"{out}/pairs") is not None
    trips0 = read_snapshot(spark, f"{out}/triplets").collect()
    assert trips0 == []  # mined, empty result

    # batch 1: 20 joins label 7 (new pairs for anchors 5 and 10) and 23
    # is background — a candidate that did NOT exist at batch 0
    e = rng.normal(size=16)
    e /= np.linalg.norm(e)
    b1 = [(20, 7, vec(d)), (23, 9, vec(e))]
    extend_triplets(
        spark,
        spark.createDataFrame(b1, "vec_id long, label int, embedding array<float>"),
        out, 1, txn_app="t",
    )
    trips = {r.anchor: (r.negative, r.mined_batch) for r in read_snapshot(
        spark, f"{out}/triplets").collect()}
    # anchor 5 stays unmined (its batch was 0, despite candidate 23 now
    # existing); anchor 10's first pair (10, 20) realizes in batch 1 ->
    # mined now, negative is the background vector
    assert 5 not in trips, trips
    assert trips == {10: (23, 1)}, trips


@pytest.mark.slow
def test_export_crash_between_stages_replays_clean(spark, tmp_path):
    """The composed export pipeline (streaming/export.py): a crash
    AFTER curation's commits but BEFORE the packing stage leaves the
    batch half-exported; replaying the whole batch must skip the fenced
    curation commits, read back the SAME admitted set, and pack it
    identically to an uncrashed run in a sibling directory."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.export import (
        CURATE_DIR,
        PACK_DIR,
        export_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.packing import (
        PACKED_TABLE,
        STATE_TABLE,
        _running_total,
    )

    app = "export-crash-test"
    out = str(tmp_path / "crashed")
    clean = str(tmp_path / "clean")
    b1 = [(i, _text(f"a{i}_")) for i in range(1, 5)]
    b2 = [(11, _text("a1_")), (12, _text("z_"))]  # 11 = exact dup of doc 1
    df1 = spark.createDataFrame(b1, ["doc_id", "text"])
    df2 = spark.createDataFrame(b2, ["doc_id", "text"])

    # simulate the crash window: batch 0 runs ONLY the curation stage
    # (same writer identity and version export_batch would use)
    curate_batch(spark, df1, f"{out}/{CURATE_DIR}", 0, txn_app=app)
    # replay batch 0 in full, then batch 1 normally
    export_batch(spark, df1, out, 0, txn_app=app)
    export_batch(spark, df2, out, 1, txn_app=app)

    export_batch(spark, df1, clean, 0, txn_app=app)
    export_batch(spark, df2, clean, 1, txn_app=app)

    def _packed(root):
        return {
            (r.doc_id, r.seq_id, r.n_tokens, r.spans_boundary, r.batch_id)
            for r in read_snapshot(
                spark, f"{root}/{PACK_DIR}/{PACKED_TABLE}"
            ).collect()
        }

    assert _packed(out) == _packed(clean)
    assert _running_total(spark, f"{out}/{PACK_DIR}/{STATE_TABLE}") == \
        _running_total(spark, f"{clean}/{PACK_DIR}/{STATE_TABLE}")
    # the exact-dup (doc 11) was dropped by the CURATION stage, so the
    # packer never saw it — stage coupling through committed state
    assert 11 not in {t[0] for t in _packed(out)}
    assert 12 in {t[0] for t in _packed(out)}
