"""Training-data operators: LSH-vs-exact equivalence, SimHash reference
check, ANN recall floor, multimodal Arrow plumbing."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
    _hashed_shingles_of,
    capped_postings,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    jaccard_pairs_from,
    simhash_signatures,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
    decode_image_batch,
    extract_features,
    multimodal_features,
    with_binary_payload,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
    COSINE_NEARDUP_THRESHOLD,
    TOP_K,
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
    neardup_candidates,
    neardup_pairs_from,
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


def test_connected_components_transitivity(spark):
    """Min-label propagation closes chains (1-2, 2-3, 3-4 -> one cluster
    with rep 1) and keeps disjoint components apart — the property that
    makes 'keep one copy per cluster' well-defined."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        connected_components,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    got = {r.doc_id: r.cluster_rep for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    """The int8 first pass must not cost meaningful recall: top-10 by
    quantized-then-rescored retrieval overlaps exact top-10 >= 90%."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_sq8,
    )

    exact = {(r.query_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    sq8 = {(r.query_id, r.neighbor_id) for r in ann_topk_sq8(spark, sf_dir).collect()}
    assert len(sq8 & exact) / len(exact) >= 0.9


@pytest.mark.slow
def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC retrieval quality floor: with 2-byte codes (32x smaller
    than the SQ8 scan) on UNSTRUCTURED random vectors — the hardest case
    for codebook compression — rescored top-5 must still overlap exact
    top-5 well above the ~0.1% chance level (measured ~0.45 at sf0.01;
    real embedding corpora with cluster structure quantize far better)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_pq,
    )

    exact = {(r.query_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    pq = {(r.query_id, r.neighbor_id) for r in ann_topk_pq(spark, sf_dir).collect()}
    assert len(pq & exact) / len(exact) >= 0.3


def test_jaccard_df_cap_defuses_hot_shingles(spark):
    """A corpus-wide boilerplate sentence must not explode the posting
    self-join: its shingles exceed the DF cap and are dropped, so the
    pair set comes only from genuine per-doc content."""
    boiler = "this content is provided under the standard licence terms v2"
    docs = [(i, f"{boiler} unique tail {i} alpha beta {i}") for i in range(300)]
    # plus one true near-dup pair with distinct (non-boilerplate) bodies
    docs += [
        (1000, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
        (1001, "zeta eta theta iota kappa lambda mu nu xi omicron pi sigma"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    postings = (
        df.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
        .select("doc_id", F.explode(_hashed_shingles_of(F.col("toks"))).alias("sh"))
    )
    capped = capped_postings(postings.persist(), cap=100)
    # boilerplate shingles (DF=300) are gone; per-doc tails stay
    assert capped.groupBy("sh").count().agg(F.max("count")).first()[0] <= 100
    pairs = {(r.doc_a, r.doc_b) for r in jaccard_pairs_from(capped).collect()}
    # the 300 boilerplate docs share nothing after the cap; only the true
    # near-dup pair (9 of 10 shingles shared, j=9/11~0.818) survives
    assert pairs == {(1000, 1001)}
    uncapped_common = postings.alias("a").join(
        postings.alias("b"),
        (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    # sanity: without the cap the join would produce >400k boilerplate rows
    assert uncapped_common.count() > 400_000


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


def test_ivf_persisted_index_partition_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF index (assignment partitioned by cell) serves a
    query by reading ONLY its nprobe cell directories — the partition
    filter reaches the scan — and returns exactly the inline IVF rows."""
    import io
    from contextlib import redirect_stdout

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        IVF_NPROBE,
        ivf_build_index,
        ivf_probe_cells,
        ivf_query_one,
    )

    path = str(tmp_path / "ivf_index")
    cents = ivf_build_index(spark, sf_dir, path)
    assert len(cents) == 16  # the quantizer really has IVF_CELLS centroids

    # take query vec_id=0's unit vector from the index itself
    row = spark.read.parquet(path).filter(F.col("neighbor_id") == 0).collect()[0]
    qvec = list(row.cu)
    cells = ivf_probe_cells(qvec, cents)
    assert len(set(cells)) == IVF_NPROBE

    df = ivf_query_one(spark, path, qvec, cents, query_id=0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]

    got = [(r.neighbor_id, r.cosine) for r in df.collect()]
    inline = {
        (r.neighbor_id, r.cosine)
        for r in ann_topk_ivf(spark, sf_dir).collect()
        if r.query_id == 0
    }
    assert set(got) == inline and len(got) == TOP_K


@pytest.mark.slow
def test_ivf_refresh_index_append_and_retrain(spark, sf_dir, tmp_path):
    """ivf_refresh_index: (a) the no-drift path assigns the increment to
    the EXISTING cells and appends — queries over the refreshed index
    equal queries over a full-corpus assignment under the same quantizer,
    and partition pruning still reaches the scan; (b) a drift-triggered
    refresh retrains on the union and equals a from-scratch
    ivf_build_index over the full corpus."""
    import io
    from contextlib import redirect_stdout

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _embedded,
        _write_assignment,
        ivf_build_index,
        ivf_load_model,
        ivf_query_one,
        ivf_refresh_index,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
        load_table,
    )

    emb_raw = load_table(spark, sf_dir, "embeddings")
    half = emb_raw.count() // 2
    corpus_raw = emb_raw.filter(F.col("vec_id") < half)

    # ---- build on the first half, refresh with the second -------------
    base = str(tmp_path / "ivf_base")
    corpus_dir = str(tmp_path / "corpus_parquet")
    corpus_raw.write.parquet(f"{corpus_dir}/embeddings.parquet")
    cents = ivf_build_index(spark, corpus_dir, base)
    assert ivf_load_model(spark, base) == cents

    # the synthetic second half genuinely drifts from a first-half-trained
    # quantizer, so pin each path explicitly: a huge threshold forces the
    # append path here, a negative one forces retrain below
    res = ivf_refresh_index(
        spark, emb_raw.filter(F.col("vec_id") >= half), base, retrain_drift=10.0
    )
    assert res["retrained"] is False and res["appended"] == emb_raw.count() - half
    index = spark.read.parquet(base)
    assert index.count() == emb_raw.count()

    # reference: the FULL corpus assigned under the SAME quantizer
    ref_path = str(tmp_path / "ivf_ref")
    emb_u = _embedded(spark, sf_dir).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    _write_assignment(emb_u, cents, ref_path, "overwrite")

    row = index.filter(F.col("neighbor_id") == 0).collect()[0]
    qvec = list(row.cu)
    got = ivf_query_one(spark, base, qvec, cents, query_id=0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]
    want = ivf_query_one(spark, ref_path, qvec, cents, query_id=0)
    assert [(r.neighbor_id, r.cosine) for r in got.collect()] == [
        (r.neighbor_id, r.cosine) for r in want.collect()
    ]

    # ---- drift-triggered retrain equals a from-scratch union build ----
    base2 = str(tmp_path / "ivf_base2")
    ivf_build_index(spark, corpus_dir, base2)
    res2 = ivf_refresh_index(
        spark,
        emb_raw.filter(F.col("vec_id") >= half),
        base2,
        retrain_drift=-1.0,  # any increment counts as drifted
    )
    assert res2["retrained"] is True
    scratch = str(tmp_path / "ivf_scratch")
    scratch_cents = ivf_build_index(spark, sf_dir, scratch)
    assert ivf_load_model(spark, base2) == scratch_cents
    got2 = ivf_query_one(spark, base2, qvec, scratch_cents, query_id=0)
    want2 = ivf_query_one(spark, scratch, qvec, scratch_cents, query_id=0)
    assert [(r.neighbor_id, r.cosine) for r in got2.collect()] == [
        (r.neighbor_id, r.cosine) for r in want2.collect()
    ]


def _emb_df(spark, rows):
    """(vec_id, label, vector) -> the (vec_id, label, v, nrm) frame
    neardup_pairs_from expects."""
    df = spark.createDataFrame(rows, ["vec_id", "label", "v"])
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    return df.select("vec_id", "label", "v", nrm.alias("nrm"))


def _synthetic_clusters():
    """5 near-dup clusters of 6 perturbed copies (cosine ~0.99+) plus 50
    random singletons, spread over 3 labels; numpy ground truth below."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows, vid = [], 0
    for c in range(5):
        base = rng.normal(size=64)
        for _ in range(6):
            v = base + rng.normal(scale=0.03, size=64)
            rows.append((vid, f"lab{c % 3}", [float(x) for x in v]))
            vid += 1
    for _ in range(50):
        v = rng.normal(size=64)
        rows.append((vid, f"lab{vid % 3}", [float(x) for x in v]))
        vid += 1
    return rows


def _exact_pairs(rows):
    import numpy as np

    out = set()
    for i, (ia, la, va) in enumerate(rows):
        for ib, lb, vb in rows[i + 1 :]:
            if la != lb:
                continue
            a, b = np.array(va), np.array(vb)
            cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
            if cos >= COSINE_NEARDUP_THRESHOLD:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_neardup_lsh_finds_synthetic_clusters(spark):
    """Banded-LSH candidates + exact verify return exactly the all-pairs
    ground truth on clustered data (cluster cosines ~0.99 sit far above
    the banding's miss region)."""
    rows = _synthetic_clusters()
    truth = _exact_pairs(rows)
    assert len(truth) >= 20, "fixture should contain near-dup pairs"
    got = {
        (r.vec_a, r.vec_b)
        for r in neardup_pairs_from(_emb_df(spark, rows)).collect()
    }
    assert got == truth


def test_embedding_neardup_cluster_reps(spark):
    """Semantic dedup: each synthetic 6-copy cluster collapses to ONE
    component whose representative is its minimum vec_id; singletons are
    absent from the output (they keep themselves)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        embedding_neardup_cluster,
    )

    rows = _synthetic_clusters()
    got = embedding_neardup_cluster(_emb_df(spark, rows)).collect()
    by_rep: dict[int, set[int]] = {}
    for r in got:
        by_rep.setdefault(r.cluster_rep, set()).add(r.vec_id)
        assert r.is_rep == (r.vec_id == r.cluster_rep)
        assert r.cluster_size == 6
    # 5 clusters of 6 perturbed copies: vec_ids [0..5], [6..11], ...
    assert by_rep == {6 * c: set(range(6 * c, 6 * c + 6)) for c in range(5)}


def test_neardup_candidates_bounded_on_hot_label(spark):
    """A hot label of random vectors must NOT go quadratic: the banded
    blocking admits only the ~B/2^R random-collision fraction of pairs
    (~6% expected for 8 bands x 8 bits), never the n^2 all-pairs join the
    round-1 form used."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (i, "hot", [float(x) for x in rng.normal(size=64)]) for i in range(200)
    ]
    n_cand = neardup_candidates(_emb_df(spark, rows)).count()
    all_pairs = 200 * 199 // 2
    assert n_cand < 0.15 * all_pairs, f"{n_cand} of {all_pairs} pairs blocked"


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


def test_decode_non_image_raises(spark, sf_dir):
    """Non-PNG payloads without Pillow keep the declared
    NotImplementedError — the honest decode boundary."""
    import query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal as mm

    if mm._PILImage is None:
        with pytest.raises(NotImplementedError):
            decode_image_batch([b"not an image at all"])
    docs = load_table(spark, sf_dir, "documents").limit(5)
    with pytest.raises(Exception):  # surfaces as task failure (text != image)
        extract_features(with_binary_payload(docs), deterministic_fake=False).collect()


_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_real_png_decode_through_features(spark):
    """REAL decode: the checked-in PNG fixtures (every scanline filter
    type) flow through the SAME Arrow mapInPandas plan as the fake
    decoder, and the extracted moments equal the known pixel values."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        resize_images,
    )

    payloads = {
        1: open(os.path.join(_FIXDIR, "gradient_rgb.png"), "rb").read(),
        2: open(os.path.join(_FIXDIR, "checker_gray.png"), "rb").read(),
    }
    bin_df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )

    real = extract_features(bin_df, deterministic_fake=False)
    fake = extract_features(bin_df, deterministic_fake=True)
    real_plan = real._jdf.queryExecution().executedPlan().toString()
    fake_plan = fake._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in real_plan  # Arrow path, not a per-row UDF
    assert "BatchEvalPython" not in real_plan
    # plan unchanged between real and fake decoder (same operator tree,
    # modulo expression ids)
    import re as _re

    strip = lambda s: _re.sub(r"#\d+", "#", s)
    assert strip(real_plan.split("\n")[0]) == strip(fake_plan.split("\n")[0])

    out = {r.doc_id: r for r in real.collect()}
    px = {
        doc_id: decode_image_batch([raw])[0][2].reshape(-1).astype(np.float32)
        for doc_id, raw in payloads.items()
    }
    for doc_id, raw in payloads.items():
        r = out[doc_id]
        assert r.n_bytes == len(raw)
        assert r.head_hex == raw[:4].hex()
        assert r.byte_mean == pytest.approx(
            float(px[doc_id].mean(dtype=np.float64)), abs=1e-9
        )
        assert r.features[3] == float(px[doc_id].max())
    # checker fixture: exact analytic mean (32 of 63 pixels are 255)
    assert out[2].byte_mean == pytest.approx(255 * 31 / 63, abs=1e-6)

    # real resize: 2-D nearest-neighbor over the decoded pixel grid
    resized = {
        r.doc_id: r
        for r in resize_images(bin_df, 4, 4, deterministic_fake=False).collect()
    }
    assert resized[2].resized_bytes == 16
    assert resized[1].resized_bytes == 48  # 4x4 RGB


# --------------------------------------------------------------------- #
# span-grain dedup + winnowing + repetition (round-3 second batch)
# --------------------------------------------------------------------- #
def test_substring_dedup_flags_planted_boilerplate(spark):
    """A 20-token boilerplate span planted into two otherwise-distinct
    docs marks every window inside the span (cross-doc duplicated) while
    a doc without the span stays clean; a short doc (< K tokens) reports
    zero windows rather than vanishing."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        _window_hashes,
    )

    span = " ".join(f"boiler{i}" for i in range(20))
    docs = [
        (1, "alpha beta " + span + " gamma delta"),
        (2, "eps zeta " + span + " eta theta"),
        (3, " ".join(f"unique{i}" for i in range(30))),
        (4, "too short"),
    ]
    toks = spark.createDataFrame(docs, ["doc_id", "text"]).select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    base = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n"),
        _window_hashes(F.col("toks"), SUBSTRING_K).alias("wins"),
    )
    pos = base.select("doc_id", F.explode("wins").alias("w"))
    nd = (
        pos.groupBy("w")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
    )
    dup = {r.doc_id: r.cnt for r in
           pos.join(nd.select("w"), "w").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # docs 1/2: the 20-token span yields 20-K+1=6 fully-internal windows
    assert dup.get(1) == dup.get(2) == 20 - SUBSTRING_K + 1
    assert 3 not in dup and 4 not in dup
    n_wins = {r.doc_id: r.nw for r in base.select(
        "doc_id", F.size("wins").alias("nw")).collect()}
    assert n_wins[4] == 0


def test_substring_dedup_within_doc_repeat_not_duplicated(spark):
    """The complement form (n_dup = n_windows - single-doc-window
    positions) must agree with the definition on its one subtle case: a
    window repeated WITHIN one doc but in no other doc is NOT duplicated
    (distinct-docs == 1 regardless of multiplicity), while a cross-doc
    window marks every position it covers in both docs."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        dedup_substring,
    )

    span = " ".join(f"rep{i}" for i in range(SUBSTRING_K))
    shared = " ".join(f"shared{i}" for i in range(SUBSTRING_K))
    docs = [
        # doc 1: the same K-token span twice, separated by unique filler —
        # both occurrences live ONLY in doc 1, so n_dup must be 0
        (1, span + " " + " ".join(f"fill{i}" for i in range(5)) + " " + span),
        # docs 2/3: one K-token span shared verbatim across two docs —
        # exactly one fully-internal window each, so n_dup = 1 each
        (2, shared + " " + " ".join(f"x{i}" for i in range(5))),
        (3, " ".join(f"y{i}" for i in range(5)) + " " + shared),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r.doc_id: r for r in dedup_substring(spark, td).collect()}
    assert out[1].n_dup_windows == 0 and not out[1].flagged
    assert out[2].n_dup_windows == 1
    assert out[3].n_dup_windows == 1


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a run of >= w + k - 1
    tokens select at least one common fingerprint, even though each doc
    keeps only ~2/(w+1) of its gram hashes."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        fingerprints_of,
    )

    run = " ".join(f"shared{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = [
        (1, " ".join(f"a{i}" for i in range(10)) + " " + run),
        (2, run + " " + " ".join(f"b{i}" for i in range(10))),
        (3, " ".join(f"c{i}" for i in range(25))),
    ]
    toks = spark.createDataFrame(docs, ["doc_id", "text"]).select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    fps = fingerprints_of(toks)
    sets = {
        r.doc_id: set(r.fs)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fs")).collect()
    }
    assert sets[1] & sets[2], "shared run must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # winnowing is a sketch: far fewer fingerprints than grams
    n_grams_3 = 25 - WINNOW_K + 1
    assert len(sets[3]) < n_grams_3


def test_repetition_flags_degenerate_doc(spark, sf_dir, tmp_path):
    """A doc that is one token repeated maxes every metric; a
    no-repetition doc zeroes the dup-gram fractions.  Run through the
    registered table-level query against a tiny parquet 'documents'
    table so the tokenize -> explode -> two-level agg path is the one
    exercised."""
    import pandas as pd

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_repetition,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["spam " * 39 + "spam", " ".join(f"w{i}" for i in range(40))],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [0, 0],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {r.doc_id: r for r in text_repetition(spark, str(d)).collect()}
    assert rows[1].top_token_frac == 1.0
    assert rows[1].dup_bigram_frac == 1.0 and rows[1].dup_trigram_frac == 1.0
    assert rows[1].flagged
    assert rows[2].dup_bigram_frac == 0.0 and rows[2].dup_trigram_frac == 0.0
    assert rows[2].top_token_frac == round(1 / 40, 6)
    assert not rows[2].flagged


def test_ivf_sq8_recall_and_agreement(spark, sf_dir):
    """The composed IVF-SQ8 pipeline (cell pruning + int8 stage-1 + exact
    re-rank) must hold the recall of its looser parent stages and agree
    with brute-force cosines on overlapping pairs."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_ivf_sq8,
    )

    bf = ann_topk_bruteforce(spark, sf_dir).collect()
    comp = ann_topk_ivf_sq8(spark, sf_dir).collect()
    bf_sets, comp_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in comp:
        assert 1 <= r.rank <= TOP_K
        comp_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf_sets[q] & comp_sets.get(q, set())) for q in bf_sets)
    total = sum(len(s) for s in bf_sets.values())
    assert hits / total >= 0.5, f"IVF-SQ8 recall collapsed: {hits}/{total}"
    bf_cos = {(r.query_id, r.neighbor_id): r.cosine for r in bf}
    for r in comp:
        if (r.query_id, r.neighbor_id) in bf_cos:
            assert abs(bf_cos[(r.query_id, r.neighbor_id)] - r.cosine) <= 1e-4 + 1e-9


def test_pack_sequences_equals_global_window(spark, sf_dir):
    """The two-pass distributed prefix sum must equal the single-reducer
    global-window form exactly — packing assignments are data, and an
    off-by-one at a partition boundary silently corrupts every sequence
    after it."""
    from pyspark.sql import Window

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        PACK_SEQ_LEN,
        corpus_pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n")
    )
    cum = F.sum("n").over(Window.orderBy("doc_id"))
    first = cum - F.col("n")
    golden = {
        r.doc_id: (r.seq_id, r.seq_offset, r.spans)
        for r in docs.select(
            "doc_id",
            F.floor(first / PACK_SEQ_LEN).alias("seq_id"),
            (first % PACK_SEQ_LEN).alias("seq_offset"),
            (F.floor((cum - 1) / PACK_SEQ_LEN) > F.floor(first / PACK_SEQ_LEN)).alias(
                "spans"
            ),
        ).collect()
    }
    got = {
        r.doc_id: (r.seq_id, r.seq_offset, r.spans_boundary)
        for r in corpus_pack_sequences(spark, sf_dir).collect()
    }
    assert got == golden and len(got) > 0
    # boundary-spanning docs must exist at this corpus/seq-len ratio
    assert any(v[2] for v in got.values())


def test_ivf_index_sq8_serving_path(spark, sf_dir, tmp_path):
    """The persisted IVF-SQ8 serving path: stage-1 reads ONLY the int8
    code column of the probed cells (column pruning next to partition
    pruning), and the staged probe returns exactly the inline
    ann_topk_ivf_sq8 rows (same deterministic training rule)."""
    import io
    from contextlib import redirect_stdout

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        N_QUERIES,
        ann_topk_ivf_sq8,
        ivf_build_index,
        ivf_query_index,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _embedded,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    path = str(tmp_path / "ivf_sq8_index")
    cents = ivf_build_index(spark, sf_dir, path)
    queries = (
        _embedded(spark, sf_dir)
        .withColumn("u", F.transform(F.col("v"), lambda x: x / F.col("nrm")))
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "u")
    )
    df = ivf_query_index(spark, path, queries, cents, sq8=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # one scan reads codes WITHOUT the full-precision vectors
    code_scans = [
        s for s in plan.split("ReadSchema: ")[1:] if "cc" in s[:120] and "cu" not in s[:120]
    ]
    assert code_scans, "stage-1 must scan the code column only"
    # both index reads prune to the probed/candidate cells at runtime
    assert "dynamicpruningexpression(cell" in plan

    got = {(r.query_id, r.neighbor_id, r.cosine) for r in df.collect()}
    inline = {
        (r.query_id, r.neighbor_id, r.cosine)
        for r in ann_topk_ivf_sq8(spark, sf_dir).collect()
    }
    release_tracked_caches()
    assert got == inline and len(got) > 0


def test_winnow_guarantee_property(spark):
    """Property check of the winnowing guarantee over randomized corpora:
    for ANY two docs sharing a contiguous run of >= w + k - 1 tokens,
    the winnowed fingerprint sets intersect.  Deterministic seeds, many
    shapes (run position, doc lengths, vocab overlap) in one Spark job."""
    import random

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        fingerprints_of,
    )

    rng = random.Random(42)
    need = WINNOW_K + WINNOW_W - 1
    docs, expected_pairs = [], []
    did = 0
    for case in range(20):
        run_len = need + rng.randint(0, 6)
        run = [f"r{case}_{i}" for i in range(run_len)]
        a_pre = [f"a{case}_{i}" for i in range(rng.randint(0, 15))]
        a_post = [f"ap{case}_{i}" for i in range(rng.randint(0, 15))]
        b_pre = [f"b{case}_{i}" for i in range(rng.randint(0, 15))]
        docs.append((did, " ".join(a_pre + run + a_post)))
        docs.append((did + 1, " ".join(b_pre + run)))
        expected_pairs.append((did, did + 1))
        did += 2
    toks = spark.createDataFrame(docs, ["doc_id", "text"]).select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    sets = {
        r.doc_id: set(r.fs)
        for r in fingerprints_of(toks)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fs"))
        .collect()
    }
    for a, b in expected_pairs:
        assert sets[a] & sets[b], f"docs {a},{b} share a {need}+-token run but no fingerprint"


def test_dedup_semantic_drops_planted_duplicates(spark, tmp_path):
    """SemDeDup keep/drop: exact duplicate vectors always share a k-means
    cell (identical argmin), so every non-minimal copy must be dropped
    with max_sim == 1.0; the deterministic survivor is the lowest id."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        dedup_semantic,
    )

    rng = np.random.default_rng(11)
    rows, groups, vid = [], [], 0
    for g in range(3):
        base = [float(x) for x in rng.normal(size=64)]
        ids = []
        for _ in range(3):
            rows.append((vid, base, g))
            ids.append(vid)
            vid += 1
        groups.append(ids)
    for _ in range(60):
        rows.append((vid, [float(x) for x in rng.normal(size=64)], vid % 5))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.vec_id: r for r in dedup_semantic(spark, str(tmp_path)).collect()}
    assert len(out) == vid
    for ids in groups:
        assert len({out[i].cell for i in ids}) == 1
        for i in ids[1:]:
            r = out[i]
            assert r.is_kept == 0 and r.n_dups >= 1 and r.max_sim == 1.0
    assert sum(r.is_kept for r in out.values()) >= 1


def test_holdout_split_leakage_safe(spark, tmp_path):
    """The holdout coin hashes CONTENT, not doc_id: exact duplicates
    always land in the same split (no train/test leakage), the three
    splits partition the corpus, and fractions track the 1%/1%/98%
    boundaries at scale."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_split_holdout,
    )

    docs = spark.range(4000).selectExpr(
        "id AS doc_id",
        # every 4th doc duplicates its predecessor's text exactly
        "concat('tok', CAST(CASE WHEN id % 4 = 1 THEN id - 1 ELSE id END AS STRING), ' body text') AS text",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = corpus_split_holdout(spark, str(tmp_path)).collect()
    by_id = {r.doc_id: (r.coin, r.split) for r in out}
    assert len(by_id) == 4000
    for i in range(1, 4000, 4):  # duplicate pairs share coin AND split
        assert by_id[i] == by_id[i - 1], i
    frac = {s: 0 for s in ("train", "validation", "test")}
    for _, s in by_id.values():
        frac[s] += 1
    assert frac["train"] > 3700
    assert 10 <= frac["test"] <= 90 and 10 <= frac["validation"] <= 90
    # determinism across invocations
    again = {
        r.doc_id: (r.coin, r.split)
        for r in corpus_split_holdout(spark, str(tmp_path)).collect()
    }
    assert again == by_id


def test_lm_model_artifact_and_backoff(spark, tmp_path):
    """The bigram LM trains into parquet model tables and scores with
    stupid backoff: first token = add-one unigram; seen bigram =
    -ln(c2/c1(prev)); unseen bigram = -ln(0.4) + add-one unigram."""
    import math

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        LM_BACKOFF,
        posixjoin,
        score_lm,
        train_lm_model,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c d")], ["doc_id", "text"]
    )
    model = str(tmp_path / "lm")
    train_lm_model(spark, docs, model)

    uni = {r.tok: r.c1 for r in spark.read.parquet(posixjoin(model, "unigrams")).collect()}
    big = {(r.prev, r.tok): r.c2 for r in spark.read.parquet(posixjoin(model, "bigrams")).collect()}
    scal = spark.read.parquet(posixjoin(model, "scalars")).collect()[0]
    assert uni == {"a": 3, "b": 3, "c": 1, "d": 1}
    assert big[("a", "b")] == 2 and big[("b", "a")] == 2 and big[("c", "d")] == 1
    assert scal.total == 8 and scal.vocab == 4

    got = {r.doc_id: r for r in score_lm(docs, spark, model).collect()}

    def addone(tok):
        return -math.log((uni[tok] + 1.0) / (scal.total + scal.vocab))

    def bigram(prev, tok):
        c2 = big.get((prev, tok))
        if c2 is None:
            return -math.log(LM_BACKOFF) + addone(tok)
        return -math.log(c2 / uni[prev])

    want1 = (addone("a") + bigram("a", "b") + bigram("b", "a") + bigram("a", "b")) / 4
    want2 = (addone("b") + bigram("b", "a") + bigram("a", "c") + bigram("c", "d")) / 4
    assert got[1].mean_nll == pytest.approx(want1, abs=1e-6)
    assert got[2].mean_nll == pytest.approx(want2, abs=1e-6)
    assert got[1].n_tokens == 4 and got[2].n_tokens == 4
    # doc 2 contains an UNSEEN bigram (a->c backs off) so it must be
    # more surprising than doc 1's all-seen bigrams
    assert got[2].mean_nll > got[1].mean_nll

    # OOV: scoring a corpus the model never saw keeps every position
    # (add-one floor with c1=0), instead of silently dropping rows
    oov = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    r = score_lm(oov, spark, model).collect()[0]
    floor = -math.log(1.0 / (scal.total + scal.vocab))
    assert r.n_tokens == 2
    assert r.mean_nll == pytest.approx(
        (floor + (-math.log(LM_BACKOFF) + floor)) / 2, abs=1e-6
    )

    # order=3: trigram table carries its denormalized bigram-context
    # denominator; backoff chain trigram -> bigram(+1 alpha) -> unigram
    # (+2 alphas), position 1 tops out at the bigram (no alpha)
    model3 = str(tmp_path / "lm3")
    train_lm_model(spark, docs, model3, order=3)
    tri = {
        (r.prev2, r.prev, r.tok): (r.c3, r.ctx_c2)
        for r in spark.read.parquet(posixjoin(model3, "trigrams")).collect()
    }
    # "a b a" occurs twice in doc 1 ("a b a b"); its context bigram
    # (a, b) occurs twice in doc 1 plus zero elsewhere -> c2 = 2
    assert tri[("a", "b", "a")] == (1, 2)
    got3 = {
        r.doc_id: r for r in score_lm(docs, spark, model3, order=3).collect()
    }

    def trigram(p2, p1, tok):
        hit = tri.get((p2, p1, tok))
        if hit is not None:
            return -math.log(hit[0] / hit[1])
        if (p1, tok) in big:
            return -math.log(LM_BACKOFF) + bigram(p1, tok)
        return 2 * -math.log(LM_BACKOFF) + addone(tok)

    want1 = (
        addone("a")            # pos 0
        + bigram("a", "b")     # pos 1 tops out at bigram
        + trigram("a", "b", "a")
        + trigram("b", "a", "b")
    ) / 4
    assert got3[1].mean_nll == pytest.approx(round(want1, 6), abs=1e-6)
    want2 = (
        addone("b")
        + bigram("b", "a")
        + trigram("b", "a", "c")  # unseen trigram AND unseen bigram a->c
        + trigram("a", "c", "d")  # unseen trigram, seen bigram c->d
    ) / 4
    assert got3[2].mean_nll == pytest.approx(round(want2, 6), abs=1e-6)


def test_quality_model_trains_gopher_log_odds(spark, tmp_path):
    """The quality model TRAINS per-bucket Laplace-smoothed log-odds of
    the Gopher keep label and round-trips through the parquet artifact:
    a token appearing only in kept docs gets a positive weight, one only
    in dropped docs a negative weight, unseen buckets weigh 0."""
    import math

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        QUALITY_MODEL_BUCKETS,
        build_quality_model,
        gopher_table,
        load_quality_weights,
    )

    stop_heavy = "the be to of and that have with " * 8  # keeps Gopher happy
    docs = spark.createDataFrame(
        [
            (1, stop_heavy + "goodword " * 10),  # kept (>=50 words, stops)
            (2, "badword " * 12),  # dropped (word-count floor, no stops)
        ],
        ["doc_id", "text"],
    )
    labels = {r.doc_id: r.keep for r in gopher_table(docs).collect()}
    assert labels == {1: 1, 2: 0}

    path = str(tmp_path / "qm")
    build_quality_model(spark, path, docs)
    w = load_quality_weights(spark, path)
    assert len(w) == QUALITY_MODEL_BUCKETS

    from pyspark.sql import functions as F

    def bucket_of(tok):
        return int(
            spark.range(1)
            .select(
                (
                    F.conv(F.substring(F.md5(F.lit(tok)), 1, 15), 16, 10)
                    .cast("long")
                    % QUALITY_MODEL_BUCKETS
                ).alias("b")
            )
            .collect()[0]["b"]
        )

    bg, bb = bucket_of("goodword"), bucket_of("badword")
    # goodword: 10 kept occurrences, 0 dropped -> ln(11/1)
    assert w[bg] == pytest.approx(round(math.log(11.0), 6), abs=1e-9)
    # badword: 0 kept, 12 dropped -> ln(1/13)
    assert w[bb] == pytest.approx(round(math.log(1.0 / 13.0), 6), abs=1e-9)
    assert w[bg] > 0 > w[bb]


def test_gopher_filter_planted_rule_violations(spark, tmp_path):
    """Each Gopher rule trips on a document crafted to violate exactly
    it (the synthetic corpus only exercises the word-count and stopword
    rules; this drives the line-shape/symbol/alpha/mwl rules)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_gopher_filter,
    )

    good = " ".join(["the", "and", "of", "word"] * 15)  # 60 words, stopwords
    bullets = "\n".join(f"- {w}" for w in ["the and of word"] * 20)
    symbols = " ".join(["the", "and", "#tag"] * 20)
    ellipsis = "\n".join(["the and of word..."] * 10)
    numbers = " ".join(["the", "and"] + ["123"] * 58)
    short = "the and of to be that have with"
    longwords = " ".join(["the", "and"] + ["x" * 30] * 58)
    rows = [
        (0, good, "en", "s", len(good)),
        (1, bullets, "en", "s", len(bullets)),
        (2, symbols, "en", "s", len(symbols)),
        (3, ellipsis, "en", "s", len(ellipsis)),
        (4, numbers, "en", "s", len(numbers)),
        (5, short, "en", "s", len(short)),
        (6, longwords, "en", "s", len(longwords)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: r for r in text_gopher_filter(spark, str(tmp_path)).collect()}
    assert got[0].keep == 1
    assert got[1].ok_bullets == 0 and got[1].keep == 0
    assert got[2].ok_symbols == 0 and got[2].keep == 0
    assert got[3].ok_ellipsis == 0 and got[3].keep == 0
    assert got[4].ok_alpha == 0 and got[4].keep == 0
    assert got[5].ok_words == 0 and got[5].keep == 0
    assert got[6].ok_mwl == 0 and got[6].keep == 0


def test_prune_prototypes_drop_rule(spark, sf_dir):
    """Per cell: exactly floor(n*3/10) dropped, and the dropped vectors
    are precisely the most prototypical ranks (1..drop_n)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        corpus_prune_prototypes,
    )

    rows = corpus_prune_prototypes(spark, sf_dir).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(by_cell) > 1
    for cell, members in by_cell.items():
        n = len(members)
        drop_n = (n * 3) // 10
        dropped = {r.proto_rank for r in members if r.is_kept == 0}
        assert dropped == set(range(1, drop_n + 1)), (cell, n)


def test_bm25_planted_relevant_doc_ranks_first(spark, tmp_path):
    """A doc saturated with the query terms must outrank everything, and
    docs with no query term must not appear (score 0 filtered)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_bm25,
    )

    filler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, ("table join spark " * 5) + filler, "en", "s", 0)]
    rows += [(i, f"{filler} iota kappa {i}", "en", "s", 0) for i in range(1, 40)]
    rows += [(100, f"one mention of table {filler}", "en", "s", 0)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = text_bm25(spark, str(tmp_path)).collect()
    ids = [r.doc_id for r in got]
    assert ids[0] == 0  # saturated doc first
    assert 100 in ids  # single-mention doc scores > 0
    assert set(ids) == {0, 100}  # no-term docs filtered out


@pytest.mark.slow
def test_ivf_pq_recall_vs_bruteforce(spark, sf_dir):
    """The composed IVF-PQ (cell pruning + 2-byte ADC codes) keeps the
    flat-PQ recall level on worst-case unstructured vectors — the cell
    restriction must not collapse retrieval (measured ~0.48 at sf0.01)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_ivf_pq,
    )

    exact = {(r.query_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    got = {(r.query_id, r.neighbor_id) for r in ann_topk_ivf_pq(spark, sf_dir).collect()}
    assert len(got & exact) / len(exact) >= 0.3


def test_dsir_selects_target_like_docs(spark, tmp_path):
    """With disjoint vocabularies, docs written in the target (en)
    vocabulary must dominate the Gumbel-top-k selection even when they
    are a minority of the corpus — the importance weights, not base
    rates, drive selection."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        DSIR_K,
        corpus_dsir_resample,
    )

    rows = []
    for i in range(60):  # minority: en-vocab docs (40 are non-target lang
        # but share the en vocabulary -> still target-LIKE)
        lang = "en" if i < 20 else "fr"
        rows.append((i, " ".join(f"envocab{j % 30}" for j in range(i, i + 40)), lang, "s", 0))
    for i in range(60, 200):  # majority: off-target vocabulary
        rows.append((i, " ".join(f"other{j % 50}" for j in range(i, i + 40)), "zh", "s", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    df = corpus_dsir_resample(spark, str(tmp_path)).collect()
    sel = [r.doc_id for r in df if r.selected == 1]
    assert len(sel) == DSIR_K
    envocab_share = sum(1 for d in sel if d < 60) / len(sel)
    assert envocab_share >= 0.55, envocab_share  # 30% of corpus, >55% of sample


def test_phrase_mining_finds_planted_collocation(spark, tmp_path):
    """A pair that ALWAYS co-occurs ("neural networks") must outrank
    pairs of independently frequent tokens — PMI rewards association,
    not raw frequency."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_phrase_mining,
    )

    rows = []
    for i in range(40):
        # 'the' and 'model' are everywhere (high frequency, low PMI);
        # 'neural networks' appears only as the fused pair
        filler = " ".join(
            f"the model w{(i * 7 + j) % 60} runs" for j in range(6)
        )
        rows.append((i, f"neural networks {filler} neural networks", "en", "s", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    top = text_phrase_mining(spark, str(tmp_path)).collect()
    assert top[0].pair == "neural networks" and top[0].rank == 1
    the_model = {r.pair: r.pmi for r in top}.get("the model")
    assert the_model is None or the_model < top[0].pmi


def test_chunk_overlap_invariants(spark, tmp_path):
    """On a 200-token doc: chunks tile the doc with the configured
    overlap, every token position is covered, consecutive chunks share
    exactly CHUNK_SIZE-CHUNK_STRIDE positions, and the tail chunk is
    short but present."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        corpus_chunk_overlap,
    )

    n = 200
    text = " ".join(f"tok{i}" for i in range(n))
    spark.createDataFrame(
        [(0, text, "en", "s", len(text)), (1, "a b c", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    rows = sorted(
        (r for r in corpus_chunk_overlap(spark, str(tmp_path)).collect() if r.doc_id == 0),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows:
        assert r.chunk_start == r.chunk_id * CHUNK_STRIDE
        covered.update(range(r.chunk_start, r.chunk_start + r.n_tokens))
    assert covered == set(range(n))
    for a, b in zip(rows, rows[1:]):
        shared = (a.chunk_start + a.n_tokens) - b.chunk_start
        if a.n_tokens == CHUNK_SIZE:
            assert shared == CHUNK_SIZE - CHUNK_STRIDE
    assert rows[-1].n_tokens <= CHUNK_SIZE
    # the 3-token doc still yields exactly one (short) chunk
    tiny = [r for r in corpus_chunk_overlap(spark, str(tmp_path)).collect() if r.doc_id == 1]
    assert len(tiny) == 1 and tiny[0].n_tokens == 3


@pytest.mark.slow
def test_assign_cells_join_equals_literal_argmin(spark, sf_dir):
    """The broadcast centroid-table assignment (large-K form) must agree
    with the plan-literal argmin on every vector, ties included."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _embedded,
        _ivf_train,
        _nearest_cell,
        assign_cells_join,
    )

    emb = _embedded(spark, sf_dir).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    cents = _ivf_train(emb.filter(F.col("vec_id") % 5 == 0), spark)
    lit = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id", _nearest_cell(F.col("u"), cents).alias("cell")
        ).collect()
    }
    joined = {r.vec_id: r.cell for r in assign_cells_join(emb, cents).collect()}
    assert joined == lit and len(joined) > 0


@pytest.mark.slow
def test_assign_cells_dispatch_large_k(spark, sf_dir):
    """At K >= ASSIGN_JOIN_MIN_CELLS the dispatcher must switch to the
    broadcast centroid-table join: the physical plan carries NO K-term
    literal argmin (codegen stays flat in K), and the assignment equals
    the literal form on every vector, ties included."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ASSIGN_JOIN_MIN_CELLS,
        _embedded,
        _nearest_cell,
        assign_cells,
    )

    emb = _embedded(spark, sf_dir).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    # K=256 centroids: the first 256 unit vectors (assignment equality
    # needs centroids, not trained ones)
    cents = [
        list(r["u"])
        for r in emb.orderBy("vec_id").limit(ASSIGN_JOIN_MIN_CELLS).collect()
    ]
    assert len(cents) == ASSIGN_JOIN_MIN_CELLS == 256

    dispatched = assign_cells(emb, cents)
    plan = dispatched._jdf.queryExecution().executedPlan().toString()
    assert "array_min" not in plan  # the literal K-term argmin is absent
    assert "BroadcastExchange" in plan or "broadcast" in plan.lower()

    lit = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id", _nearest_cell(F.col("u"), cents).alias("cell")
        ).collect()
    }
    got = {r.vec_id: r.cell for r in dispatched.collect()}
    assert got == lit and len(got) > 0

    # below the switch point the dispatcher keeps the literal plan
    small = assign_cells(emb, cents[:16])
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "array_min" in small_plan


@pytest.mark.slow
def test_probe_cells_dispatch_large_k(spark, sf_dir):
    """The query-side probe dispatcher (`_probe_cells`): at
    K >= PROBE_JOIN_MIN_CELLS the probe set must come from the broadcast
    centroid-table join (no K-term literal sort in the plan — serving
    pays Catalyst per CALL, so plan size must stay flat in K) and must
    equal the literal argmin-array form on every query, ties included."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        IVF_NPROBE,
        PROBE_JOIN_MIN_CELLS,
        _dot,
        _embedded,
        _probe_cells,
    )

    emb = _embedded(spark, sf_dir).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "u"
    )
    cents = [
        list(r["u"])
        for r in emb.orderBy("vec_id").limit(PROBE_JOIN_MIN_CELLS).collect()
    ]
    assert len(cents) == PROBE_JOIN_MIN_CELLS

    dispatched = _probe_cells(spark, queries, cents)
    plan = dispatched._jdf.queryExecution().executedPlan().toString()
    assert "array_sort" not in plan  # the K-struct literal sort is absent
    assert "broadcast" in plan.lower()
    joined = {(r.query_id, r.cell) for r in dispatched.collect()}

    # the same K cells through the literal argmin-array expression
    lit_probe = F.slice(
        F.array_sort(
            F.array(
                *[
                    F.struct(
                        (-_dot(F.col("u"), F.lit(c))).alias("d"),
                        F.lit(i).alias("c"),
                    )
                    for i, c in enumerate(cents)
                ]
            )
        ),
        1,
        IVF_NPROBE,
    )
    lit = {
        (r.query_id, r.cell)
        for r in queries.select(
            "query_id",
            F.explode(F.transform(lit_probe, lambda s: s["c"])).alias("cell"),
        ).collect()
    }
    assert joined == lit and len(joined) == 20 * IVF_NPROBE

    # below the switch point the dispatcher keeps the literal plan
    small = _probe_cells(spark, queries, cents[:16])
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "array_sort" in small_plan


def test_rp_projection_preserves_distances(spark, sf_dir):
    """JL property: the scaled +-1 projection to 8 dims preserves pairwise
    squared L2 distances in expectation -- over many pairs the mean ratio
    projected/original must sit near 1 (loose band: k=8 has high per-pair
    variance, but the mean over ~200 pairs concentrates)."""
    import math
    import random

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        RP_OUT_DIM,
        embedding_project_rp,
    )

    rows = embedding_project_rp(spark, sf_dir).collect()
    orig = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    proj = {r["vec_id"]: [r[f"p{k}"] for k in range(RP_OUT_DIM)] for r in rows}
    assert set(proj) == set(orig) and len(proj) == 500

    rng = random.Random(7)
    ids = sorted(proj)
    ratios = []
    for _ in range(200):
        a, b = rng.sample(ids, 2)
        d_orig = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d_proj = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        if d_orig > 1e-9:
            ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3, mean
    assert all(math.isfinite(r) for r in ratios)


def test_rp_ann_recall_floor(spark, sf_dir):
    """The JL-projected candidate stage must hold a documented recall
    floor against the exact brute-force top-k (the trade is 16/64 of the
    stage-1 mul-adds for imperfect recall — the floor makes the trade
    honest, not silent)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_rp,
    )

    bf = {(r.query_id, r.neighbor_id) for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    rp = {(r.query_id, r.neighbor_id) for r in ann_topk_rp(spark, sf_dir).collect()}
    recall = len(bf & rp) / len(bf)
    assert recall >= 0.5, recall


def test_jpeg_stdlib_decode_fixtures():
    """Baseline-JPEG without Pillow (VERDICT r4 #7): the checked-in
    spec-conformant fixtures (flat gray = analytically exact DC-only
    round-trip; 4:2:0 solid color = exact through subsampling; gradients
    with restart markers + non-MCU-aligned dims = byte-stable) decode
    through the stdlib path."""
    import hashlib

    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        _decode_jpeg_stdlib,
    )

    w, h, px = _decode_jpeg_stdlib(
        open(os.path.join(_FIXDIR, "flat_gray.jpg"), "rb").read()
    )
    assert (w, h, px.shape[2]) == (16, 8, 1)
    # q=1 flat blocks: DC-only, exact round-trip
    assert (px[:, :8, 0] == 100).all() and (px[:, 8:, 0] == 200).all()

    w, h, px = _decode_jpeg_stdlib(
        open(os.path.join(_FIXDIR, "flat_color_420.jpg"), "rb").read()
    )
    assert (w, h, px.shape[2]) == (16, 16, 3)
    # solid color survives RGB<->YCbCr + 4:2:0 subsampling exactly here
    assert (px == np.array([70, 130, 200], dtype=np.uint8)).all()

    # gradients: byte-stable decode (pinned hash) + close to the source
    for name, digest, shape in [
        ("gradient_rgb_444.jpg", "1027298da70150fa", (8, 8, 3)),
        ("ramp_gray_restart.jpg", "da8e924f3865c345", (10, 24, 1)),
    ]:
        _, _, px = _decode_jpeg_stdlib(
            open(os.path.join(_FIXDIR, name), "rb").read()
        )
        assert px.shape == shape
        assert hashlib.sha256(px.tobytes()).hexdigest()[:16] == digest


def test_jpeg_roundtrip_through_fixture_encoder():
    """Encoder/decoder agreement on fresh images: q=1 baseline streams
    round-trip within IDCT/color rounding (<=2/channel), exactly for
    flat blocks — the property that makes the fixtures trustworthy."""
    import sys as _sys

    import numpy as np

    _sys.path.insert(0, _FIXDIR)
    from make_jpeg_fixtures import encode_jpeg

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        _decode_jpeg_stdlib,
    )

    rng = np.random.RandomState(7)
    # smooth random image (low-frequency): rounding error stays tiny
    base = rng.randint(40, 216, size=(3, 4, 3)).astype(np.float64)
    img = np.round(
        np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    ).astype(np.uint8)  # 24x32 RGB, flat 8x8 tiles
    for sub in ("444", "420"):
        _, _, px = _decode_jpeg_stdlib(encode_jpeg(img, subsampling=sub))
        assert int(np.abs(px.astype(int) - img.astype(int)).max()) <= 2, sub

    gray = np.round(
        np.repeat(np.repeat(rng.randint(0, 256, size=(2, 3)), 8, 0), 8, 1)
    ).astype(np.uint8)
    _, _, px = _decode_jpeg_stdlib(encode_jpeg(gray))
    assert (px[:, :, 0] == gray).all()  # flat tiles: exact


def test_jpeg_decode_through_features_same_arrow_plan(spark):
    """The JPEG payloads flow through the SAME Arrow mapInPandas plan as
    the fake decoder (plan equality, the PNG precedent) and the moments
    equal the decoded pixel values."""
    import re as _re

    import numpy as np

    payloads = {
        1: open(os.path.join(_FIXDIR, "flat_gray.jpg"), "rb").read(),
        2: open(os.path.join(_FIXDIR, "gradient_rgb_444.jpg"), "rb").read(),
    }
    bin_df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    real = extract_features(bin_df, deterministic_fake=False)
    fake = extract_features(bin_df, deterministic_fake=True)
    real_plan = real._jdf.queryExecution().executedPlan().toString()
    fake_plan = fake._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in real_plan
    assert "BatchEvalPython" not in real_plan
    strip = lambda s: _re.sub(r"#\d+", "#", s)  # noqa: E731
    assert strip(real_plan.split("\n")[0]) == strip(fake_plan.split("\n")[0])

    out = {r.doc_id: r for r in real.collect()}
    assert out[1].byte_mean == pytest.approx(150.0, abs=1e-9)  # half 100, half 200
    px = decode_image_batch([payloads[2]])[0][2].reshape(-1)
    assert out[2].byte_mean == pytest.approx(
        float(px.astype(np.float64).mean()), abs=1e-9
    )


def test_entropy_known_values(spark, tmp_path):
    """Hand-checkable entropies: a single-char run is 0 bits, a perfect
    two-char alternation is 1 bit, 4 equiprobable chars are 2 bits; the
    low-entropy flag gates on the rounded value."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_entropy,
    )

    rows = [
        (0, "aaaaaaaa", "en", "s", 8),
        (1, "abababab", "en", "s", 8),
        (2, "abcdabcd", "en", "s", 8),
        (3, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: r for r in text_entropy(spark, str(tmp_path)).collect()}
    assert got[0].entropy == 0.0 and got[0].is_low_entropy
    assert got[1].entropy == 1.0 and got[1].is_low_entropy
    assert got[2].entropy == 2.0 and not got[2].is_low_entropy
    assert got[3].entropy > 3.5 and not got[3].is_low_entropy
    assert got[3].len_chars == 43


def test_entropy_plan_shuffle_free(spark, sf_dir):
    """The entropy operator is a pure per-row projection — no Exchange
    anywhere in the plan, so it scales as the parquet scan itself."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        text_entropy,
    )

    plan = text_entropy(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_distinctive_term_ranks_first(spark, tmp_path):
    """A term unique to one doc must be that doc's top keyword; a term
    present in EVERY doc has idf ln(1) = 0 and scores exactly 0."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        TFIDF_TOPK,
        text_tfidf_keywords,
    )

    rows = [
        (0, "common zebra zebra zebra common filler", "en", "s", 0),
        (1, "common apple filler other words here", "en", "s", 0),
        (2, "common banana filler more words again", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = text_tfidf_keywords(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    top0 = min(by_doc[0], key=lambda r: r.rank)
    assert top0.term == "zebra"
    ubiquitous = [r for r in got if r.term == "common"]
    assert all(r.tfidf == 0.0 for r in ubiquitous)
    assert all(len(v) <= TFIDF_TOPK for v in by_doc.values())
    for v in by_doc.values():
        assert sorted(r.rank for r in v) == list(range(1, len(v) + 1))


def test_filtered_ann_respects_predicate(spark, sf_dir):
    """Every returned neighbor passes the metadata gate, queries stay
    unrestricted, and per-query result size is capped at TOP_K."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ANN_FILTER_LABEL_MOD,
        ann_topk_filtered,
    )

    got = ann_topk_filtered(spark, sf_dir)
    labels = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    joined = got.join(labels, "neighbor_id").collect()
    assert joined, "filtered ANN returned nothing"
    assert all(r.label % ANN_FILTER_LABEL_MOD == 0 for r in joined)
    per_q = {}
    for r in joined:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(c <= TOP_K for c in per_q.values())


def test_hybrid_rrf_fuses_both_legs(spark, tmp_path):
    """An item that is rank 1 on BOTH legs must win the fusion with
    rrf = round(2/(K+1+60-60)... i.e. 2/(60+1), and items present on one
    leg only still appear with the other leg's rank NULL."""
    import math

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        DIM,
        HYBRID_RRF_K,
        ann_hybrid_rrf,
    )

    filler = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(0, f"table join spark {filler}", "en", "s", 0)]
    # doc 7: saturated with the query terms -> lexical rank 1
    docs += [(7, ("table join spark " * 6) + filler, "en", "s", 0)]
    docs += [(i, f"{filler} iota kappa {i}", "en", "s", 0) for i in (1, 2, 3, 4, 5)]
    # doc 9: lexical-only candidate (one term), no embedding row
    docs += [(9, f"one table mention {filler}", "en", "s", 0)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    def unit(seed: int) -> list[float]:
        v = [math.sin(seed * DIM + d + 1) for d in range(DIM)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    q = unit(0)
    vecs = [(0, q, 0), (7, q, 0)]  # vec 7 == query vector -> cosine 1, vec rank 1
    vecs += [(i, unit(i), 0) for i in (1, 2, 3, 4, 5)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    got = ann_hybrid_rrf(spark, str(tmp_path)).collect()
    top = got[0]
    assert top.doc_id == 7
    assert top.lex_rank == 1 and top.vec_rank == 1
    assert top.rrf == round(2.0 / (HYBRID_RRF_K + 1), 6)
    lex_only = [r for r in got if r.doc_id == 9]
    assert lex_only and lex_only[0].vec_rank is None


def test_containment_catches_doc_inside_doc(spark, tmp_path):
    """A short doc fully embedded in a long one: containment ~1 flags the
    pair while its Jaccard (~|A|/|B|) sits far below the dedup threshold
    — the asymmetric case the Jaccard path is blind to."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        capped_postings,
        dedup_containment,
        jaccard_pairs_from,
        postings_of,
    )

    short = " ".join(f"w{i}" for i in range(12))
    long = short + " " + " ".join(f"x{i}" for i in range(120))
    other = " ".join(f"y{i}" for i in range(40))
    rows = [(0, short, "en", "s", 0), (1, long, "en", "s", 0), (2, other, "en", "s", 0)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = dedup_containment(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in got}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r.containment_a == 1.0  # all of the short doc lives in the long one
    assert r.containment_b < 0.5
    # and the Jaccard path would NOT have flagged it
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    jac = jaccard_pairs_from(capped_postings(postings_of(docs))).collect()
    assert all(not (p.doc_a == 0 and p.doc_b == 1) for p in jac)
    assert 10.0 / 130.0 < JACCARD_THRESHOLD  # the blind spot being tested


def test_lsh_candidates_bucket_cap_star(spark):
    """Buckets <= cap emit all pairs; an over-cap (boilerplate-blown)
    bucket emits exactly m-1 star edges to its min doc — nothing
    quadratic — and every member stays one hop from the rep."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        lsh_candidates,
    )

    rows = [(d, 0, 111) for d in range(50)]  # giant bucket, m=50 > cap=10
    rows += [(100, 1, 222), (101, 1, 222), (102, 1, 222)]  # small, m=3
    bands = spark.createDataFrame(rows, "doc_id long, band int, key long")
    got = {(r.doc_a, r.doc_b) for r in lsh_candidates(bands, cap=10).collect()}
    star = {(0, d) for d in range(1, 50)}
    small = {(100, 101), (100, 102), (101, 102)}
    assert got == star | small


@pytest.mark.slow
def test_assign_twolevel_agreement(spark):
    """Two-level (coarse-group) assignment must agree with the exact
    broadcast-join dispatcher on clustered data — its target regime
    (real embedding corpora cluster; that structure is WHY a coarse
    level can route).  On structureless uniform vectors the coarse
    level cannot help (measured ~35% agreement) — which is why the
    exact dispatcher stays the default and two-level is an explicit
    opt-in for the K ∝ N scale path."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        DIM,
        _ivf_train,
        assign_cells_join,
        assign_cells_twolevel,
    )

    def clustered_vecs(n, n_clusters=64, noise=0.25):
        base = spark.range(n).select(F.col("id").alias("vec_id"))
        cid = F.col("vec_id") % n_clusters
        comps = [
            (
                F.xxhash64(cid * DIM + F.lit(d)) / F.lit(float(2**63))
                + noise
                * (
                    F.xxhash64(F.col("vec_id") * DIM + F.lit(d) + F.lit(7777777))
                    / F.lit(float(2**63))
                )
            ).alias(f"x{d}")
            for d in range(DIM)
        ]
        v = F.array(*comps)
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return base.select("vec_id", F.transform(v, lambda x: x / nrm).alias("u"))

    emb = clustered_vecs(20_000)
    cents = _ivf_train(emb.filter(F.col("vec_id") % 5 == 0), spark, k=256)
    exact = {r.vec_id: (r.cell, r.cos) for r in assign_cells_join(emb, cents).collect()}
    two = {r.vec_id: (r.cell, r.cos) for r in assign_cells_twolevel(emb, cents).collect()}
    assert set(two) == set(exact)
    same = sum(1 for v in exact if two[v][0] == exact[v][0])
    assert same / len(exact) >= 0.95, f"agreement {same / len(exact):.3f}"
    worst = max(exact[v][1] - two[v][1] for v in exact)
    assert worst <= 0.05, f"worst cosine loss {worst:.4f}"


@pytest.mark.slow
def test_ivf_twolevel_symmetric_probe_recall(spark, tmp_path):
    """Serving a TWO-LEVEL-assigned index must probe through the SAME
    coarse quantizer.  Regime: many fine clusters with no coarse
    hierarchy (clusters >> groups), where two-level assignment disagrees
    heavily with exact assignment — probing the exact-nearest cells then
    collapses recall (measured 0.10 at 1M vectors / K=1000), while
    symmetric probing keeps it high because near-identical vectors make
    the same coarse-quantizer decisions."""
    from pyspark.sql import Window

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        DIM,
        _dot,
        _ivf_train,
        _sq8_code,
        assign_cells_twolevel,
        ivf_query_index,
    )

    # K = 2 cells per latent cluster — the K ∝ N operating point the
    # scale probe runs (1M vectors / 512 clusters / K=1000)
    n, n_clusters, k_cells, n_q, rk = 20_000, 64, 128, 32, 10

    def clustered(nrows):
        base = spark.range(nrows).select(F.col("id").alias("vec_id"))
        cid = F.col("vec_id") % n_clusters
        comps = [
            (
                F.xxhash64(cid * DIM + F.lit(d)) / F.lit(float(2**63))
                + 0.2
                * (
                    F.xxhash64(F.col("vec_id") * DIM + F.lit(d) + F.lit(31337))
                    / F.lit(float(2**63))
                )
            ).alias(f"x{d}")
            for d in range(DIM)
        ]
        v = F.array(*comps)
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return base.select("vec_id", F.transform(v, lambda x: x / nrm).alias("u"))

    emb = clustered(n).persist()
    cents = _ivf_train(emb.filter(F.col("vec_id") % 4 == 0), spark, k=k_cells)
    path = str(tmp_path / "ivf_2l")
    emb.join(
        assign_cells_twolevel(emb, cents).select("vec_id", "cell"), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("u").alias("cu"),
        _sq8_code(F.col("u")).alias("cc"),
        "cell",
    ).write.partitionBy("cell").parquet(path)

    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "u"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    truth = {
        (r.query_id, r.neighbor_id)
        for r in q.select("query_id", F.col("u").alias("qu"))
        .crossJoin(emb.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("cu")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(_dot("qu", "cu"), 4).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rk)
        .collect()
    }

    def recall(twolevel):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_query_index(
                spark, path, q, cents, k=rk, twolevel=twolevel
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_sym, r_exact = recall(True), recall(False)
    emb.unpersist()
    # symmetric probing must not lose to exact-nearest probing on a
    # two-level index, and must clear a serving-quality floor
    assert r_sym >= r_exact, (r_sym, r_exact)
    assert r_sym >= 0.85, f"symmetric-probe recall {r_sym:.3f}"


@pytest.mark.slow
def test_cc_star_equals_minlabel_random(spark):
    """Alternating large-star/small-star must produce the identical
    (doc_id, cluster_rep) labeling as min-label propagation on shallow
    random graphs — the regime both serve."""
    import random

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(3):
        pairs = set()
        for _ in range(60):
            a, b = rng.randrange(80), rng.randrange(80)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        rows = [(a, b) for a, b in pairs]
        e = spark.createDataFrame(rows, "src long, dst long")
        edges = e.union(e.selectExpr("dst AS src", "src AS dst"))
        ml = {(r.doc_id, r.cluster_rep) for r in connected_components(edges).collect()}
        st = {(r.doc_id, r.cluster_rep) for r in connected_components_star(edges).collect()}
        assert st == ml, f"trial {trial}: star != min-label"


@pytest.mark.slow
def test_cc_chain_falls_back_to_star(spark):
    """A chain longer than CC_MAX_ROUNDS (diameter > rounds) used to
    raise; it must now fall back to the star variant and still label
    every vertex with the chain minimum."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        CC_MAX_ROUNDS,
        connected_components,
    )

    n = CC_MAX_ROUNDS * 3  # diameter 3x the min-label round budget
    rows = [(i, i + 1) for i in range(n)]
    e = spark.createDataFrame(rows, "src long, dst long")
    edges = e.union(e.selectExpr("dst AS src", "src AS dst"))
    got = {r.doc_id: r.cluster_rep for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_trained_disk_artifact_roundtrip(spark):
    """The disk-backed quantizer cache must hand a FRESH process exactly
    the floats a retrain would produce: json round-trip is exact for
    doubles, and the artifact path is salted with the corpus fingerprint
    so a different corpus never shares it."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators import (
        similarity as sim,
    )

    sf = "/root/testdata/sf0.001"
    key = (sf, "ivf", sim.IVF_CELLS)
    # train once through the full path (possibly loading a prior artifact)
    first = sim._trained(
        key,
        lambda: sim._ivf_train(
            sim._embedded(spark, sf)
            .withColumn("u", F.transform(F.col("v"), lambda x: x / F.col("nrm")))
            .filter(F.col("vec_id") % 5 == 0),
            spark,
        ),
    )
    # a fresh process is simulated by clearing the in-process level: the
    # second lookup must come from DISK and be float-for-float identical
    sim._TRAINED_CACHE.pop(key)
    def _fail():
        raise AssertionError("retrained instead of loading the artifact")
    second = sim._trained(key, _fail)
    assert second == first
    # exactness of the serialization itself (not just approximate)
    import json

    assert json.loads(json.dumps(first)) == first
    # a corpus with different content keys a different path
    home = sim._quant_artifact_dir(sf, key)
    assert home is not None and "qopcfdr_quant1_" in home


def test_bpe_merge_fold_reference(spark):
    """The string fold must implement standard left-to-right
    non-overlapping BPE merging, including the no-retrigger property
    (a freshly merged symbol never re-matches the pair's left side) and
    merged-symbol participation in LATER rounds."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.bpe import (
        _merge_fold,
    )

    def ref_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    cases = [
        (["a"], "a", "b"),
        (["a", "b"], "a", "b"),
        (["a", "a", "a"], "a", "a"),          # overlap: (aa)(a), not (a)(aa)
        (["a", "a", "a", "a"], "a", "a"),     # (aa)(aa)
        (["x", "a", "b", "a", "b", "y"], "a", "b"),
        (["m", "er", "er"], "m", "er"),       # merged symbol as right ctx
        (["er", "er", "er"], "er", "er"),
    ]
    df = spark.createDataFrame(
        [(i, " ".join(s)) for i, (s, _, _) in enumerate(cases)], ["i", "ws"]
    )
    for i, (syms, a, b) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_merge_fold(F.col("ws"), a, b).alias("f"))
            .collect()[0]["f"]
        )
        assert got == " ".join(ref_merge(syms, a, b)), (syms, a, b, got)


def test_bpe_tokenize_join_never_broadcasts_vocab(spark, sf_dir):
    """The trained vocabulary is a derived aggregate — its plan-time
    stats estimate must never ride a broadcast (shuffle_hash pinned)."""
    import io
    from contextlib import redirect_stdout

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.bpe import (
        text_bpe_tokenize,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        text_bpe_tokenize(spark, sf_dir).explain("formatted")
    release_tracked_caches()
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan, plan[:1500]
    assert "BroadcastHashJoin" not in plan, plan[:1500]


def test_stratified_allocation_exact(spark, sf_dir):
    """Largest-remainder apportionment: the sample is EXACTLY the budget,
    every stratum gets floor(share) or floor(share)+1, and ranks within
    each stratum are the contiguous prefix 1..alloc."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        STRATIFIED_BUDGET_DOCS,
        corpus_sample_stratified,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
        load_table,
    )

    rows = corpus_sample_stratified(spark, sf_dir).collect()
    release_tracked_caches()
    assert len(rows) == STRATIFIED_BUDGET_DOCS
    counts = {}
    for r in rows:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    per_stratum = {
        r["lang"]: r["c"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(per_stratum.values())
    for lang, k in counts.items():
        base = STRATIFIED_BUDGET_DOCS * per_stratum[lang] // n
        assert k in (base, base + 1), (lang, k, base)
        got_rks = sorted(r["rk"] for r in rows if r["lang"] == lang)
        assert got_rks == list(range(1, k + 1)), (lang, got_rks)


def test_model_eval_degenerate_split_null_metrics(spark, tmp_path):
    """A one-class eval slice must yield NULL AUC (division guard), not a
    crash or a fabricated number."""
    import os

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        model_eval_auc,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    # corpus whose eval slice is all Gopher-drop (too few words): every
    # doc is 3 tokens, so keep=0 everywhere -> n_pos = 0 -> auc NULL.
    # Texts are DISTINCT (the split coin hashes content, so identical
    # texts would all land in one split and empty the eval slice).
    docs = spark.createDataFrame(
        [(i, f"a b c{i}") for i in range(200)], ["doc_id", "text"]
    )
    sf = str(tmp_path / "sfdeg")
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    row = model_eval_auc(spark, sf).collect()[0]
    release_tracked_caches()
    assert row["n_pos"] == 0
    assert row["auc_micro"] is None
    assert row["recall_micro"] is None


def test_holt_fold_matches_python_reference(spark, tmp_path):
    """The dyadic-shift Holt recurrence must equal the plain-Python
    reference on a synthetic daily series, including negative trends."""
    import os

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.plans.relational import (
        HOLT_ONE,
        events_holt_forecast,
    )

    # one event per (type, second) within chosen days -> daily counts
    counts = [30, 5, 4, 8, 2, 1]  # sharp drop -> negative trend
    rows = []
    eid = 0
    import datetime as dt

    for day, n in enumerate(counts):
        for j in range(n):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=day, seconds=j)
            rows.append((eid, ts, 1, "t1", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    sf = str(tmp_path / "sfholt")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    def ref(ys):
        l, t = ys[0] * HOLT_ONE, 0
        for y in ys[1:]:
            nl = (y * HOLT_ONE + 3 * (l + t)) >> 2
            t = (nl - l + 7 * t) >> 3
            l = nl
        return l, t

    got = events_holt_forecast(spark, sf).collect()[0]
    l, t = ref(counts)
    assert t < 0  # the scenario really exercises negative shifts
    assert (got["level_micro"], got["trend_micro"]) == (l, t)
    assert got["forecast_next_micro"] == l + t


def test_near_dup_pair_artifact_equals_live_derivation(spark, sf_dir):
    """The build-once pair artifact must be byte-equivalent to a live
    dedup_minhash_lsh run — consumers' oracles replay the LIVE
    derivation, so any drift here would surface as driver mismatches."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        dedup_minhash_lsh,
        near_dup_pairs,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    art = {tuple(r) for r in near_dup_pairs(spark, sf_dir).collect()}
    live = {tuple(r) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    release_tracked_caches()
    assert art == live and len(art) > 0


def test_span_removal_keeps_owner_strips_copies(spark):
    """ExactSubstr semantics: a 15-token span shared by two documents
    survives in the min-doc_id owner and is stripped from the copy;
    tokens outside the shared span are untouched; unrelated and
    shorter-than-K documents pass through whole."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        span_removal_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    span = " ".join(f"s{i}" for i in range(SUBSTRING_K))
    docs = [
        (0, f"alpha beta {span} gamma"),  # owner (min doc_id)
        (1, "totally unrelated words only here"),
        (2, f"intro words {span} outro tail"),  # copy: span stripped
        (3, "tiny"),  # shorter than K: untouched
    ]
    tok = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    got = {r["doc_id"]: r for r in span_removal_from(tok).collect()}
    release_tracked_caches()
    assert got[0]["n_removed"] == 0
    assert got[0]["cleaned_text"] == f"alpha beta {span} gamma"
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == SUBSTRING_K
    assert got[2]["cleaned_text"] == "intro words outro tail"
    assert got[3]["n_removed"] == 0 and got[3]["cleaned_text"] == "tiny"


def test_shard_balance_snake_bounds_spread(spark):
    """Snake-draft sharding: adversarially skewed lengths (one giant doc,
    geometric tail) still land within one max-document of perfect
    balance across shards, and every document is placed exactly once."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        SHARD_COUNT,
    )

    # replicate the operator's assignment over a synthetic frame
    docs = [(i, max(1, 2 ** (12 - i // 3))) for i in range(64)]  # skewed
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    r = F.row_number().over(w) - 1
    cycle, pos = (r / SHARD_COUNT).cast("long"), r % SHARD_COUNT
    shard = F.when(cycle % 2 == 0, pos).otherwise(SHARD_COUNT - 1 - pos)
    out = (
        df.select("doc_id", "n_tokens", shard.alias("shard"))
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("tokens"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(out) == SHARD_COUNT
    assert sum(r["n"] for r in out) == len(docs)
    toks = sorted(r["tokens"] for r in out)
    max_doc = max(n for _, n in docs)
    assert toks[-1] - toks[0] <= max_doc  # snake bound


def test_shard_balance_fixed_length_corpus_exact(spark, tmp_path):
    """A FIXED-LENGTH corpus (every doc the same token count — exactly
    what corpus_chunk_overlap / corpus_pack_sequences emit) is one
    giant length tie-group.  The TIE_SUB_BUCKETS level must (a) keep
    the per-shard aggregate EXACT against the global-sort oracle —
    within a tie every doc weighs the same, so sub-bucket placement is
    permutation-invariant — and (b) actually split the tie, so no
    window task holds the whole corpus."""
    import duckdb

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        CORPUS_SHARD_SQL,
        SHARD_COUNT,
        corpus_shard_balance,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from .oracle_util import compare

    n = 400
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(7))) for i in range(n)]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = corpus_shard_balance(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(got, con, CORPUS_SHARD_SQL)
    release_tracked_caches()
    assert not problems, problems
    # fixed-length + n divisible by SHARD_COUNT -> perfectly balanced
    rows = got.collect()
    assert len(rows) == SHARD_COUNT
    assert {r["tokens"] for r in rows} == {7 * n // SHARD_COUNT}
    assert {r["n_docs"] for r in rows} == {n // SHARD_COUNT}
    release_tracked_caches()


def test_embedding_triplets_picks_hardest_non_partner(spark, sf_dir):
    """The mined negative must be (a) not the anchor, (b) not any of the
    anchor's positive partners, and (c) at least as close as every other
    non-partner candidate — i.e. genuinely the hardest negative."""
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        _dot,
        _embedded,
        embedding_triplets,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        TRIPLET_POS_TAU,
    )

    rows = embedding_triplets(spark, sf_dir).collect()
    assert rows, "fixture must yield triplets"
    full = {
        r["vec_id"]: (r["label"], r["v"], r["nrm"])
        for r in _embedded(spark, sf_dir).collect()
    }
    release_tracked_caches()

    def cos(a, b):
        _, va, na = full[a]
        _, vb, nb = full[b]
        return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 4)

    # the op's pair set, BOTH orientations (an anchor may also be the
    # vec_b of another pair — those are partners too)
    ids = sorted(full)
    partners = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j and full[i][0] == full[j][0] and cos(i, j) >= TRIPLET_POS_TAU:
                partners[i].add(j)
                partners[j].add(i)

    for r in rows:
        a, neg = r["anchor"], r["negative"]
        assert neg != a and neg not in partners[a]
        assert r["cos_an"] == cos(a, neg)
        best = max(cos(a, c) for c in ids if c != a and c not in partners[a])
        assert r["cos_an"] == best


@pytest.mark.slow
def test_triplets_ivf_matches_exact_below_cap(spark, sf_dir):
    """The scale form's positive stage EQUALS the exact form below
    TRIPLET_BLOCK_CAP (single shard -> all-pairs), and its IVF-probed
    negative can never beat the exact full-scan negative (probing reads
    a subset of the corpus); agreement at nprobe=3/16 on the
    near-orthogonal fixture stays above the probe fraction."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        embedding_triplets,
        embedding_triplets_ivf,
    )

    exact = {(r.anchor, r.positive): r for r in embedding_triplets(spark, sf_dir).collect()}
    ivf = {(r.anchor, r.positive): r for r in embedding_triplets_ivf(spark, sf_dir).collect()}
    assert exact, "fixture must yield triplets"
    assert set(exact) == set(ivf), "positives must match exactly below the cap"
    agree = 0
    for k, r in ivf.items():
        assert r.cos_ap == exact[k].cos_ap
        assert r.cos_an <= exact[k].cos_an + 1e-9, (
            "a probed negative cannot be harder than the full-scan one"
        )
        agree += r.negative == exact[k].negative
    assert agree / len(ivf) >= 0.4, f"negative agreement collapsed: {agree}/{len(ivf)}"


@pytest.mark.slow
def test_triplets_ivf_recovers_hard_negative_on_clustered_data(spark, tmp_path):
    """On data with real cluster structure — where hard-negative mining
    matters — the IVF probe recovers the exact hardest negative: twin
    trios share a direction, land in the same cell, and the anchor's
    own probed cell carries its cross-label twin."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        embedding_triplets,
        embedding_triplets_ivf,
    )

    rng = np.random.default_rng(11)
    rows, vid = [], 0
    for g in range(4):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        for lab in (2 * g, 2 * g + 1):  # twin trios: same direction, two labels
            for _ in range(3):
                v = base + rng.normal(scale=0.02, size=64)
                rows.append((vid, [float(x) for x in v], lab))
                vid += 1
    for _ in range(40):  # background singletons
        v = rng.normal(size=64)
        rows.append((vid, [float(x) for x in v], 100 + vid % 2))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    exact = {(r.anchor, r.positive): r for r in embedding_triplets(spark, str(tmp_path)).collect()}
    ivf = {(r.anchor, r.positive): r for r in embedding_triplets_ivf(spark, str(tmp_path)).collect()}
    assert len(exact) >= 12, "each twin trio must yield positives"
    assert set(exact) == set(ivf)
    for k, r in ivf.items():
        assert r.negative == exact[k].negative, (
            f"anchor {k[0]}: probe missed the clustered hard negative "
            f"({r.negative} vs {exact[k].negative})"
        )
        assert r.cos_an == exact[k].cos_an


def test_triplet_block_candidates_subshard_bounds_hot_label(spark, monkeypatch):
    """Above the cap a label sub-shards deterministically: pairs stay
    within (label, vec_id % nshards) blocks — per-shard work bounded by
    ~cap^2 — and every vector keeps pairing inside its shard."""
    import query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "TRIPLET_BLOCK_CAP", 4)
    rows = [(i, "hot", [float(i)] * 4) for i in range(10)] + [
        (90 + i, "cold", [float(i + 1)] * 4) for i in range(3)
    ]
    cand = {
        (r.vec_a, r.vec_b)
        for r in sim._triplet_block_candidates(_emb_df(spark, rows)).collect()
    }
    # hot: n=10, cap=4 -> nsh=3 -> shards {0,3,6,9},{1,4,7},{2,5,8}
    hot_expect = set()
    for shard in ({0, 3, 6, 9}, {1, 4, 7}, {2, 5, 8}):
        hot_expect |= {(a, b) for a in shard for b in shard if a < b}
    # cold: n=3 <= cap -> single shard, all pairs
    cold_expect = {(90, 91), (90, 92), (91, 92)}
    assert cand == hot_expect | cold_expect


def test_ann_range_ivf_recall_and_subset(spark, sf_dir):
    """Probed radius search returns a SUBSET of the exact tau set (it
    can only miss, never invent — cosines are exact on probed
    candidates) with recall above the probe fraction."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        ann_range_ivf,
        ann_range_search,
    )

    exact = {(r.query_id, r.neighbor_id) for r in ann_range_search(spark, sf_dir).collect()}
    got = {(r.query_id, r.neighbor_id) for r in ann_range_ivf(spark, sf_dir).collect()}
    assert exact, "fixture must yield range results"
    assert got <= exact
    assert len(got & exact) / len(exact) >= 0.3, (
        f"range recall collapsed: {len(got & exact)}/{len(exact)}"
    )


@pytest.mark.slow
def test_ivf_persisted_index_radius_serving(spark, sf_dir, tmp_path):
    """ivf_query_index(radius=tau) over the persisted index returns
    exactly the in-plan probed-radius rows (same quantizer, same probe
    order) — and refuses the sq8 path."""
    import pytest as _pytest

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        RANGE_TAU,
        _embedded,
        ann_range_ivf,
        ivf_build_index,
        ivf_query_index,
    )

    idx = str(tmp_path / "ivf_idx")
    cents = ivf_build_index(spark, sf_dir, idx)
    emb = _embedded(spark, sf_dir).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "u"
    )
    served = ivf_query_index(spark, idx, q, cents, radius=RANGE_TAU)
    want = {
        (r.query_id, r.neighbor_id, r.cosine)
        for r in ann_range_ivf(spark, sf_dir).collect()
    }
    got = {(r.query_id, r.neighbor_id, r.cosine) for r in served.collect()}
    assert got == want
    with _pytest.raises(ValueError):
        ivf_query_index(spark, idx, q, cents, radius=RANGE_TAU, sq8=True)


def test_multimodal_audio_wav_roundtrip(spark):
    """The audio path writes REAL RIFF/WAV containers and parses them
    back with the stdlib reader: payloads carry the RIFF magic and the
    decoded features equal the direct computation over the
    deterministic waveform."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        AUDIO_BASE_SAMPLES,
        AUDIO_FEATURE_SCHEMA,
        AUDIO_MOD_SAMPLES,
        AUDIO_PAYLOAD_SCHEMA,
        AUDIO_RATE,
        _wav_samples,
        decode_audio_batch,
        synth_wav_batch,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 7, 63, 64, 1000)], "doc_id long")
    wav = ids.mapInPandas(synth_wav_batch, AUDIO_PAYLOAD_SCHEMA)
    payloads = {r.doc_id: bytes(r.payload) for r in wav.collect()}
    for doc_id, p in payloads.items():
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        n = AUDIO_BASE_SAMPLES + doc_id % AUDIO_MOD_SAMPLES
        assert len(p) == 44 + 2 * n  # canonical header + 16-bit mono PCM

    feats = {
        r.doc_id: r
        for r in wav.mapInPandas(decode_audio_batch, AUDIO_FEATURE_SCHEMA).collect()
    }
    for doc_id in payloads:
        s = _wav_samples(doc_id, AUDIO_BASE_SAMPLES + doc_id % AUDIO_MOD_SAMPLES)
        r = feats[doc_id]
        assert r.sample_rate == AUDIO_RATE
        assert r.n_samples == len(s)
        assert r.peak == max(abs(x) for x in s)
        assert r.sum_sq == sum(x * x for x in s)
        assert r.zero_crossings == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )


def test_embedding_standardize_semantics(spark, sf_dir):
    """Standardized dimensions have ~zero mean and unit variance (in
    micro-units), and the transform stage is shuffle-free codegen (the
    stats are driver-side model state, never a 64-key shuffle join)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        STANDARDIZE_MICRO,
        embedding_standardize,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    z = embedding_standardize(spark, sf_dir)
    per_dim = z.groupBy("pos").agg(
        F.avg("z_micro").alias("m"),
        F.stddev_pop(F.col("z_micro").cast("double")).alias("s"),
    ).collect()
    release_tracked_caches()
    assert len(per_dim) == 64
    for r in per_dim:
        assert abs(r.m) < 0.02 * STANDARDIZE_MICRO  # mean ~ 0
        assert abs(r.s - STANDARDIZE_MICRO) < 0.02 * STANDARDIZE_MICRO


def test_pca_power_finds_dominant_direction(spark, tmp_path):
    """On data with a planted dominant direction, the power-iteration
    component aligns with it: projections of on-direction vectors sit
    near +-1 (micro-units) and background projections near 0."""
    import numpy as np

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.similarity import (
        PCA_MICRO,
        embedding_pca_power,
    )

    rng = np.random.default_rng(5)
    d = rng.normal(size=64)
    d /= np.linalg.norm(d)
    rows = []
    for i in range(60):  # dominant cluster
        v = 3.0 * d + rng.normal(scale=0.05, size=64)
        rows.append((i, [float(x) for x in v], 0))
    for i in range(60, 100):  # isotropic background
        rows.append((i, [float(x) for x in rng.normal(size=64)], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    got = {r.vec_id: r.pc1_micro for r in embedding_pca_power(spark, str(tmp_path)).collect()}
    on_dir = [abs(got[i]) for i in range(60)]
    background = [abs(got[i]) for i in range(60, 100)]
    assert min(on_dir) > 0.95 * PCA_MICRO  # unit vectors along the PC
    assert sum(background) / len(background) < 0.5 * PCA_MICRO
    # all on-direction projections share one sign (same side of the PC)
    signs = {1 if got[i] > 0 else -1 for i in range(60)}
    assert len(signs) == 1


def test_lpa_separates_bridged_cliques(spark):
    """Synchronous LPA: two 4-cliques joined by one bridge edge resolve
    to two communities labeled by each clique's min id — the bridge is
    outvoted by intra-clique neighbors every round, which is exactly
    the density-over-reachability property that distinguishes LPA from
    connected components (one component here, two communities)."""
    import itertools

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        lpa_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    cl1 = list(itertools.combinations([1, 2, 3, 4], 2))
    cl2 = list(itertools.combinations([5, 6, 7, 8], 2))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in cl1 + cl2 + [(4, 5)]], "doc_a long, doc_b long"
    )
    res = {r.doc_id: r.label for r in lpa_from(pairs).collect()}
    release_tracked_caches()
    assert res == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 5}


def test_modularity_exact_on_bridged_cliques(spark):
    """Exact integer modularity on the barbell graph (two 4-cliques +
    bridge, m=13): each clique community has e_c=6 intra edges and
    degree mass d_c=13, so q_num = 4*13*6 - 13^2 = 143 per community
    and Q = 286/676 ~ 0.423 — hand-checked against Newman's formula."""
    import itertools

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.graph import (
        modularity_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    cl1 = list(itertools.combinations([1, 2, 3, 4], 2))
    cl2 = list(itertools.combinations([5, 6, 7, 8], 2))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in cl1 + cl2 + [(4, 5)]], "doc_a long, doc_b long"
    )
    rows = {
        (r.label, r.e_c, r.d_c, r.q_num) for r in modularity_from(pairs).collect()
    }
    release_tracked_caches()
    assert rows == {(1, 6, 13, 143), (5, 6, 13, 143)}


def test_avi_container_roundtrip_pure():
    """Container-logic half of the video path, Spark-free (default
    gate): writer/parser round-trip, frame bytes, and malformed-input
    rejection."""
    import pytest as _p

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        VIDEO_H,
        VIDEO_USEC_PER_FRAME,
        VIDEO_W,
        _avi_bytes,
        _parse_avi,
        _video_pixel,
    )

    for doc_id, n in ((0, 4), (7, 6), (123, 8)):
        data = _avi_bytes(doc_id, n)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        w, h, nf, usec, frames = _parse_avi(data)
        assert (w, h, nf, usec) == (VIDEO_W, VIDEO_H, n, VIDEO_USEC_PER_FRAME)
        assert list(frames[-1]) == [
            _video_pixel(doc_id, n - 1, i) for i in range(VIDEO_W * VIDEO_H)
        ]
    with _p.raises(ValueError):
        _parse_avi(b"RIFX" + b"\x00" * 64)
    # truncation is rejected loudly, never silently clamped (a short
    # frame would otherwise yield wrong features)
    whole = _avi_bytes(7, 5)
    with _p.raises(ValueError):
        _parse_avi(whole[: len(whole) - 10])


def test_dedup_phash_planted_neardups(spark, tmp_path):
    """Perceptual-hash image dedup end-to-end on a planted corpus: the
    payloads are REAL PNGs (encoder -> stdlib decoder round-trip), and
    within a PHASH_GROUP member m toggles exactly m hash bits, so every
    within-group pair must surface with Hamming |m_a - m_b| <= 3 — and
    the result must hash-match the cell-formula DuckDB oracle."""
    import duckdb

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        DEDUP_PHASH_SQL,
        PHASH_GRID,
        PHASH_GROUP,
        PHASH_IMG,
        PHASH_PAYLOAD_SCHEMA,
        _phash_cell_value,
        decode_image_batch,
        dedup_phash,
        synth_image_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from .oracle_util import compare

    # codec round-trip pin: decoded pixels == the cell formula
    ids = spark.createDataFrame([(0,), (3,)], "doc_id long")
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in ids.mapInPandas(
            synth_image_batch, PHASH_PAYLOAD_SCHEMA
        ).collect()
    }
    scale = PHASH_IMG // PHASH_GRID
    for doc_id, payload in payloads.items():
        w, h, px = decode_image_batch([payload])[0]
        assert (w, h) == (PHASH_IMG, PHASH_IMG)
        for y in range(PHASH_IMG):
            for x in range(PHASH_IMG):
                cell = (y // scale) * PHASH_GRID + x // scale
                assert int(px[y][x][0]) == _phash_cell_value(doc_id, cell)

    # planted corpus: 4 groups x 4 members (text unused by the operator)
    n = 4 * PHASH_GROUP
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = dedup_phash(spark, str(tmp_path))
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in got.collect()}
    for g in range(4):
        for a in range(PHASH_GROUP):
            for b in range(a + 1, PHASH_GROUP):
                key = (g * PHASH_GROUP + a, g * PHASH_GROUP + b)
                assert pairs.get(key) == b - a, (key, pairs.get(key))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(dedup_phash(spark, str(tmp_path)), con, DEDUP_PHASH_SQL)
    release_tracked_caches()
    assert not problems, problems

    # the keep-one-per-cluster composition: every group of 4 collapses
    # to one cluster whose rep is its smallest member
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        dedup_phash_cluster,
    )

    clustered = {
        r.doc_id: r for r in dedup_phash_cluster(spark, str(tmp_path)).collect()
    }
    release_tracked_caches()
    assert len(clustered) == n
    for d, r in clustered.items():
        assert r.cluster_rep == (d // PHASH_GROUP) * PHASH_GROUP
        assert r.cluster_size == PHASH_GROUP
        assert r.is_rep == (d == r.cluster_rep)


def test_dedup_video_frames_planted_shared_scene(spark, tmp_path):
    """Frame-level video near-dup on a planted corpus.  The fixture's
    frame pattern c = (31*doc + 257*f) % 256 gives EXACT shared sampled
    frames between doc and doc+190 (31*190 = 2 mod 256 = one 2-step of
    f, and sampled frames step by 2), and doc / doc+256 share their
    whole pattern — both must surface with min_hamming 0, and the
    result must hash-match the DuckDB oracle."""
    import duckdb

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        DEDUP_VIDEO_FRAMES_SQL,
        dedup_video_frames,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from .oracle_util import compare

    ids = [0, 190, 5, 261, 1000]  # (0,190) offset-share; (5,261) full-share
    spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = dedup_video_frames(spark, str(tmp_path))
    rows = {(r.vid_a, r.vid_b): r for r in got.collect()}
    assert (0, 190) in rows and rows[(0, 190)].min_hamming == 0
    assert (5, 261) in rows and rows[(5, 261)].min_hamming == 0
    # full-share pair matches at least its shared sampled-frame count
    # (doc 5: n_frames 9 -> sampled {0,2,4,6}; doc 261: n_frames 5 ->
    # sampled {0,2,4}; identical pattern -> >= 3 identical-class hits)
    assert rows[(5, 261)].n_frame_matches >= 3

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(
        dedup_video_frames(spark, str(tmp_path)), con, DEDUP_VIDEO_FRAMES_SQL
    )
    release_tracked_caches()
    assert not problems, problems


def test_dedup_audio_fp_planted_shifted_clip(spark, tmp_path):
    """Audio fingerprint near-dup on a planted corpus: doc 66's
    waveform is doc 0's shifted by -2 (31*66 = -2 mod 2048), so their
    48-bit sign fingerprints differ only where a sample sits in [0, 2)
    — the pair must surface with exactly the Hamming distance the
    waveform formula predicts, and the result must hash-match the
    oracle."""
    import duckdb

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        AUDIO_FP_BITS,
        DEDUP_AUDIO_FP_SQL,
        _wav_samples,
        dedup_audio_fp,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from .oracle_util import compare

    ids = [0, 66, 100000]
    spark.createDataFrame(
        [(i, f"a{i}") for i in ids], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def sign_bits(d):
        return [int(s >= 0) for s in _wav_samples(d, AUDIO_FP_BITS)]

    want_ham = sum(
        a != b for a, b in zip(sign_bits(0), sign_bits(66))
    )
    assert want_ham <= 3  # else the fixture algebra note is stale

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_audio_fp(spark, str(tmp_path)).collect()
    }
    assert got.get((0, 66)) == want_ham, (got, want_ham)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(
        dedup_audio_fp(spark, str(tmp_path)), con, DEDUP_AUDIO_FP_SQL
    )
    release_tracked_caches()
    assert not problems, problems


@pytest.mark.slow
def test_multimodal_video_avi_roundtrip(spark):
    """The video path writes REAL RIFF/AVI containers and parses them
    back by walking the chunk tree: payloads carry the RIFF/'AVI '
    magic, the recovered geometry and frame bytes equal the direct
    computation, frame SAMPLING picks every FRAME_SAMPLE_EVERY-th
    frame, and a malformed container is rejected loudly."""
    import pytest as _p

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        FRAME_SAMPLE_EVERY,
        VIDEO_BASE_FRAMES,
        VIDEO_FEATURE_SCHEMA,
        VIDEO_H,
        VIDEO_MOD_FRAMES,
        VIDEO_PAYLOAD_SCHEMA,
        VIDEO_USEC_PER_FRAME,
        VIDEO_W,
        _parse_avi,
        _video_pixel,
        decode_video_batch,
        synth_avi_batch,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 3, 4, 123, 999)], "doc_id long")
    avi = ids.mapInPandas(synth_avi_batch, VIDEO_PAYLOAD_SCHEMA)
    payloads = {r.doc_id: bytes(r.payload) for r in avi.collect()}
    for doc_id, p in payloads.items():
        assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
        w, h, nf, usec, frames = _parse_avi(p)
        n_expect = VIDEO_BASE_FRAMES + doc_id % VIDEO_MOD_FRAMES
        assert (w, h, nf, usec) == (
            VIDEO_W, VIDEO_H, n_expect, VIDEO_USEC_PER_FRAME,
        )
        assert list(frames[0]) == [
            _video_pixel(doc_id, 0, i) for i in range(VIDEO_W * VIDEO_H)
        ]

    feats = {
        r.doc_id: r
        for r in avi.mapInPandas(decode_video_batch, VIDEO_FEATURE_SCHEMA).collect()
    }
    for doc_id in payloads:
        n = VIDEO_BASE_FRAMES + doc_id % VIDEO_MOD_FRAMES
        sampled = list(range(0, n, FRAME_SAMPLE_EVERY))
        r = feats[doc_id]
        assert r.sampled_frames == len(sampled)
        assert r.sum_pix == sum(
            _video_pixel(doc_id, f, i)
            for f in sampled
            for i in range(VIDEO_W * VIDEO_H)
        )

    with _p.raises(ValueError):
        _parse_avi(b"RIFX" + b"\x00" * 64)


def test_export_tar_shards_deterministic_bytes(spark, tmp_path):
    """Two exports of the same corpus produce byte-identical tar
    shards (fixed mtime/uid/gid/mode, members in position order) — the
    property that makes replays idempotent and shard sets diffable."""
    import hashlib
    import os

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        export_tar_shards,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    sf = "/root/testdata/sf0.001"
    outs = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        rows = export_tar_shards(spark, sf, out).collect()
        assert rows and all(r.n_members > 0 for r in rows)
        release_tracked_caches()
        outs.append(out)

    def digest(out):
        return {
            n: hashlib.md5(open(os.path.join(out, n), "rb").read()).hexdigest()
            for n in sorted(os.listdir(out))
        }

    d_a, d_b = digest(outs[0]), digest(outs[1])
    assert d_a == d_b and len(d_a) >= 16  # one tar per non-empty shard chunk


def test_read_tar_shards_roundtrip(spark, tmp_path):
    """export_tar_shards -> read_tar_shards is a lossless round-trip:
    every (doc_id, text) comes back exactly once with the position the
    shuffle assigned it (the loader-side inverse)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        corpus_shuffle_shards,
        export_tar_shards,
        read_tar_shards,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "tars")
    export_tar_shards(spark, sf, out).collect()
    release_tracked_caches()

    got = {
        r.doc_id: (r.shard, r.pos, r.text)
        for r in read_tar_shards(spark, out).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    order = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle_shards(spark, sf).collect()
    }
    release_tracked_caches()
    assert set(got) == set(docs)
    for d, (shard, pos, text) in got.items():
        assert text == docs[d]
        assert (shard, pos) == order[d]


def test_text_novelty_first_seen_credit(spark, tmp_path):
    """text_novelty after the join-free rewrite: n_novel is the count of
    shingles whose global first (min doc_id) occurrence is this doc —
    planted: doc 0 owns all its shingles, doc 1 repeats doc 0 verbatim
    (zero novel), doc 2 is fresh text (all novel); oracle hash parity."""
    import duckdb

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        TEXT_NOVELTY_SQL,
        text_novelty,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    from .oracle_util import compare

    shared = " ".join(f"s{j}" for j in range(12))
    fresh = " ".join(f"f{j}" for j in range(12))
    docs = [(0, shared), (1, shared), (2, fresh)]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = text_novelty(spark, str(tmp_path))
    rows = {r.doc_id: (r.n_grams, r.n_novel) for r in got.collect()}
    # 12 tokens, K=8 -> 5 distinct shingles per doc
    assert rows[0] == (5, 5)
    assert rows[1] == (5, 0)
    assert rows[2] == (5, 5)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(text_novelty(spark, str(tmp_path)), con, TEXT_NOVELTY_SQL)
    release_tracked_caches()
    assert not problems, problems


def test_banded_pair_joins_emit_exactly_once(spark, tmp_path):
    """The first-agreeing-band join predicate replaced the trailing
    ``.distinct()`` in every banded-Hamming self-join (r9 optimization):
    a pair agreeing on SEVERAL bands — identical signatures agree on all
    of them — must still surface exactly once.  Planted multi-band
    agreement per family; video's cand grain is pinned separately by
    ``test_dedup_video_frames_planted_shared_scene`` (its
    n_frame_matches sum is multiplicity-sensitive)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        dedup_simhash,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        PHASH_GROUP,
        audio_fp_pairs_from,
        dedup_phash,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    def multiplicities(df, keys):
        return (
            df.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .collect()
        )

    # --- simhash: identical texts -> identical 60-bit signatures ------
    shared_a = " ".join(f"a{j}" for j in range(10))
    shared_b = " ".join(f"b{j}" for j in range(10))
    docs = [(0, shared_a), (1, shared_a), (2, shared_a), (3, shared_b), (4, shared_b)]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = dedup_simhash(spark, str(tmp_path))
    assert multiplicities(got, ["doc_a", "doc_b"]) == []
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in got.collect()}
    for key in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert pairs[key] == 0, (key, pairs)

    # --- phash: within a PHASH_GROUP all toggled bits are low-order,
    # so higher bands agree on every within-group pair -----------------
    n = 4 * PHASH_GROUP
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = dedup_phash(spark, str(tmp_path))
    assert multiplicities(got, ["doc_a", "doc_b"]) == []
    assert got.count() == 4 * (PHASH_GROUP * (PHASH_GROUP - 1) // 2)
    release_tracked_caches()

    # --- audio: doc_ids 2048 apart share the fingerprint exactly
    # (31*2048 = 0 mod 2048), agreeing on all four bands ---------------
    ids = [(k * 2048,) for k in range(4)] + [(1,), (3,)]
    got = audio_fp_pairs_from(spark.createDataFrame(ids, "doc_id long"))
    assert multiplicities(got, ["doc_a", "doc_b"]) == []
    same_class = {(r.doc_a, r.doc_b) for r in got.collect() if r.hamming == 0}
    expected = {
        (a * 2048, b * 2048) for a in range(4) for b in range(a + 1, 4)
    }
    assert expected <= same_class
    release_tracked_caches()

    # --- embedding near-dup: perturbed copies (cosine ~0.99+) agree on
    # most of the 8 bands ----------------------------------------------
    rows = _synthetic_clusters()
    cand = neardup_candidates(_emb_df(spark, rows))
    assert multiplicities(cand, ["vec_a", "vec_b"]) == []
    got = {(r.vec_a, r.vec_b) for r in cand.collect()}
    # every within-cluster pair of the 5 planted clusters must block
    for c in range(5):
        for a in range(6 * c, 6 * c + 6):
            for b in range(a + 1, 6 * c + 6):
                assert (a, b) in got, (a, b)
