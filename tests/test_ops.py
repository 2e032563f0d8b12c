"""Training-data operators: LSH-vs-exact equivalence, SimHash reference
check, ANN recall floor, multimodal Arrow plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    simhash_signatures,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
    decode_image_batch,
    extract_features,
    multimodal_features,
    with_binary_payload,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
    TOP_K,
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
    load_table,
)


def test_minhash_lsh_equals_exact(spark, sf_dir):
    """Banded MinHash-LSH + verify finds exactly the exact-Jaccard pairs
    (the corpus near-dups sit at j~0.97 where band miss prob ~1e-20)."""
    exact = {(r.doc_a, r.doc_b, r.jaccard) for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b, r.jaccard) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert exact, "fixture corpus should contain near-duplicate pairs"
    assert lsh == exact


def _py_simhash(text: str) -> int:
    votes = [0] * 60
    for tok in set(text.lower().split(" ")):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(60):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(60) if votes[b] > 0)


def test_simhash_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    texts = {r.doc_id: r.text for r in docs.collect()}
    sigs = {
        r.doc_id: r.simhash
        for r in simhash_signatures(spark, sf_dir).filter(F.col("doc_id") < 20).collect()
    }
    for doc_id, text in texts.items():
        assert sigs[doc_id] == _py_simhash(text), doc_id


def test_simhash_pairs_run(spark, sf_dir):
    rows = dedup_simhash(spark, sf_dir).collect()
    for r in rows:
        assert r.hamming <= 3 and r.doc_a < r.doc_b


def test_ann_lsh_recall(spark, sf_dir):
    """The bucketed ANN must return valid ranked rows whose hits agree with
    brute force; recall floor is modest (random vectors carry no cluster
    structure for LSH to exploit)."""
    bf = ann_topk_bruteforce(spark, sf_dir).collect()
    lsh = ann_topk_lsh(spark, sf_dir).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_sets = {}
    for r in lsh:
        assert 1 <= r.rank <= TOP_K
        lsh_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(bf_sets) == set(range(20))
    hits = sum(len(bf_sets[q] & lsh_sets.get(q, set())) for q in bf_sets)
    total = sum(len(s) for s in bf_sets.values())
    assert hits / total >= 0.05, f"recall collapsed: {hits}/{total}"
    # exact cosine agreement on overlapping pairs
    bf_cos = {(r.query_id, r.neighbor_id): r.cosine for r in bf}
    for r in lsh:
        if (r.query_id, r.neighbor_id) in bf_cos:
            assert abs(bf_cos[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_ann_ivf_recall(spark, sf_dir):
    """IVF with nprobe=3/16 cells must keep solid recall against brute
    force, with exact cosine agreement on overlapping pairs."""
    bf = ann_topk_bruteforce(spark, sf_dir).collect()
    ivf = ann_topk_ivf(spark, sf_dir).collect()
    bf_sets, ivf_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ivf:
        assert 1 <= r.rank <= TOP_K
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf_sets[q] & ivf_sets.get(q, set())) for q in bf_sets)
    total = sum(len(s) for s in bf_sets.values())
    assert hits / total >= 0.5, f"IVF recall collapsed: {hits}/{total}"
    bf_cos = {(r.query_id, r.neighbor_id): r.cosine for r in bf}
    for r in ivf:
        if (r.query_id, r.neighbor_id) in bf_cos:
            # bf divides by norms, ivf pre-normalizes: the two roundings
            # can land one ulp of the 4th decimal apart
            assert abs(bf_cos[(r.query_id, r.neighbor_id)] - r.cosine) <= 1e-4 + 1e-9


def test_multimodal_features_deterministic(spark, sf_dir):
    out = {r.doc_id: r for r in multimodal_features(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(out) == set(docs)
    import numpy as np

    for doc_id in list(docs)[:10]:
        payload = docs[doc_id].encode()
        arr = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float32)
        assert out[doc_id].n_bytes == len(payload)
        assert out[doc_id].head_hex == payload[:4].hex()
        assert out[doc_id].byte_mean == pytest.approx(float(arr.mean()), abs=1e-4)


def test_multimodal_resize_and_frames(spark, sf_dir):
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        FRAME_SIZE,
        FRAME_STRIDE,
        resize_images,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    bin_df = with_binary_payload(docs)
    resized = {r.doc_id: r for r in resize_images(bin_df, 8, 8).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(resized) == set(texts)
    for r in resized.values():
        assert r.resized_bytes == 64 and r.width == 8 and r.height == 8

    frames = sample_frames(bin_df).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.frame_idx % FRAME_STRIDE == 0
        assert 0 < r.frame_bytes <= FRAME_SIZE
    for doc_id, text in texts.items():
        n_frames = max((len(text.encode()) + FRAME_SIZE - 1) // FRAME_SIZE, 1)
        expected = len(range(0, n_frames, FRAME_STRIDE))
        assert len(by_doc[doc_id]) == expected, doc_id


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL sketch (approx_count_distinct) stays within its documented
    relative error vs the exact distinct count."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.count_distinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05, row


def test_decode_stub_raises(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image_batch(None)
    docs = load_table(spark, sf_dir, "documents").limit(5)
    with pytest.raises(Exception):  # NotImplementedError surfaces as task failure
        extract_features(with_binary_payload(docs), deterministic_fake=False).collect()
