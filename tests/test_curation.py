"""Streaming corpus curation (streaming/curation.py): quality gate,
within-batch exact + near dedup, batch-vs-corpus near-dup against the
persisted index, and exactly-once admission across replays."""

from __future__ import annotations

import json
import os
import time

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
    q.awaitTermination(300)
    assert not q.isActive
    assert _doc_ids(spark, out) == [1, 3]

    # batch 2: 101 is a near-dup of batch-1's doc 1 (must be dropped
    # against the PERSISTED index), 102 is fresh
    _write_batch(src, "b2.json", [
        (101, _neardup("alpha")),
        (102, _text("gamma")),
    ])
    q2 = run_curation_stream(spark, src, out, ckpt)
    q2.awaitTermination(300)
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
    q3.awaitTermination(120)
    assert _doc_ids(spark, out) == [1, 3, 102]
