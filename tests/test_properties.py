"""Property-based tests (hypothesis) for the engine's pure-math kernels:
random inputs, engine-level invariants — the guarantees example tests
can only spot-check.

Spark calls are batched (one job per property run, not per example)
where a JVM round-trip would dominate.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------- #
# stdlib PNG decoder: decode(encode(pixels)) == pixels for every color
# type, size, and scanline filter (the encoder cycles all five filters)
# --------------------------------------------------------------------- #
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=10),
    color=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, color, data):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import numpy as np
    from make_png_fixture import encode_png

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (
        decode_image_batch,
    )

    channels = {0: 1, 2: 3, 6: 4}[color]
    px = data.draw(
        st.lists(
            st.lists(
                st.tuples(
                    *([st.integers(min_value=0, max_value=255)] * channels)
                ),
                min_size=w,
                max_size=w,
            ),
            min_size=h,
            max_size=h,
        )
    )
    encoded = encode_png(px, color)
    dw, dh, arr = decode_image_batch([encoded])[0]
    assert (dw, dh) == (w, h)
    want = np.array([[list(p) for p in row] for row in px], dtype=np.uint8)
    assert np.array_equal(arr, want)


# --------------------------------------------------------------------- #
# sequence packing: invariants under random token counts and random
# partition counts (the streamed/batch equality tests pin equality; this
# pins the CONTRACT itself)
# --------------------------------------------------------------------- #
def test_pack_assignments_invariants_property(spark):
    import random

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        PACK_SEQ_LEN,
        pack_assignments,
    )

    rng = random.Random(20260814)
    for trial in range(4):
        n_docs = rng.randint(1, 120)
        rows = [
            (i, rng.randint(1, 3 * PACK_SEQ_LEN))  # docs may span sequences
            for i in range(n_docs)
        ]
        base = rng.choice([0, 7, PACK_SEQ_LEN - 1, 5 * PACK_SEQ_LEN + 3])
        docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = {
            r.doc_id: r
            for r in pack_assignments(
                docs, base=base, num_partitions=rng.choice([1, 3, 9])
            ).collect()
        }
        assert len(out) == n_docs
        cum = base
        for i in range(n_docs):  # replay the contract sequentially
            r = out[i]
            assert r.seq_id == cum // PACK_SEQ_LEN, (trial, i)
            assert r.seq_offset == cum % PACK_SEQ_LEN, (trial, i)
            assert r.spans_boundary == (
                (cum + r.n_tokens - 1) // PACK_SEQ_LEN > r.seq_id
            ), (trial, i)
            assert 0 <= r.seq_offset < PACK_SEQ_LEN
            cum += r.n_tokens


# --------------------------------------------------------------------- #
# HALF_UP rounding: _round4 must equal Spark's F.round on arbitrary
# doubles (one batched Spark job for all examples)
# --------------------------------------------------------------------- #
def test_round4_matches_spark_property(spark):
    import random
    import struct

    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.ewma import (
        _round4,
    )

    rng = random.Random(4)
    vals: list[float] = []
    for _ in range(400):
        kind = rng.random()
        if kind < 0.4:
            vals.append(rng.uniform(-1000, 1000))
        elif kind < 0.8:
            # dyadic half-cases at the 4th decimal: k/2^n near x.xxxx5
            vals.append(rng.randint(-10**7, 10**7) / 2 ** rng.randint(1, 20))
        else:
            # random bit patterns (finite only)
            b = rng.getrandbits(64)
            f = struct.unpack("<d", struct.pack("<Q", b))[0]
            if f == f and abs(f) < 1e15:
                vals.append(f)
    got = [_round4(v) for v in vals]
    want = [
        r.r
        for r in spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
        .orderBy("i")
        .select(F.round("v", 4).alias("r"))
        .collect()
    ]
    assert got == want


# --------------------------------------------------------------------- #
# ExactSubstr span removal: the distributed operator equals a direct
# per-corpus Python reference on adversarial corpora (heavy shared
# phrases, whole-doc copies, sub-window docs).  Corpora are token-tagged
# and unioned so each example costs ONE Spark job.
# --------------------------------------------------------------------- #
def _ref_span_removal(docs, k):
    from collections import defaultdict

    docs_by_w = defaultdict(set)
    for d, t in docs:
        for s in range(len(t) - k + 1):
            docs_by_w[tuple(t[s : s + k])].add(d)
    owners = {w: min(ds) for w, ds in docs_by_w.items() if len(ds) >= 2}
    out = {}
    for d, t in docs:
        removed = set()
        for s in range(len(t) - k + 1):
            w = tuple(t[s : s + k])
            if w in owners and owners[w] != d:
                removed.update(range(s, s + k))
        kept = [tok for i, tok in enumerate(t) if i not in removed]
        out[d] = (len(t), len(removed), " ".join(kept))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_span_removal_matches_reference_property(data, spark):
    from pyspark.sql import functions as F

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.dedup import (
        SUBSTRING_K,
        span_removal_from,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        release_tracked_caches,
    )

    k = SUBSTRING_K
    vocab = ["a", "b", "c"]
    all_rows, expected = [], {}
    for cid in range(4):  # 4 independent corpora per example, one job
        phrases = [
            data.draw(
                st.lists(
                    st.sampled_from(vocab), min_size=k, max_size=k + 8
                )
            )
            for _ in range(2)
        ]
        docs = []
        n_docs = data.draw(st.integers(min_value=2, max_value=5))
        for d in range(n_docs):
            kind = data.draw(st.integers(min_value=0, max_value=3))
            if kind == 0 and docs:  # whole-doc copy
                toks = list(docs[data.draw(st.integers(0, len(docs) - 1))][1])
            elif kind == 1:  # shared phrase embedded in noise
                pad = data.draw(
                    st.lists(st.sampled_from(vocab), min_size=0, max_size=6)
                )
                toks = pad + phrases[data.draw(st.integers(0, 1))] + pad[::-1]
            elif kind == 2:  # sub-window doc (shorter than k)
                toks = data.draw(
                    st.lists(st.sampled_from(vocab), min_size=1, max_size=k - 1)
                )
            else:  # random tokens
                toks = data.draw(
                    st.lists(st.sampled_from(vocab), min_size=1, max_size=2 * k)
                )
            docs.append((d, toks))
        tagged = [
            (cid * 10_000 + d, [f"c{cid}x{t}" for t in toks])
            for d, toks in docs
        ]
        all_rows += tagged
        expected.update(_ref_span_removal(tagged, k))

    df = spark.createDataFrame(
        all_rows, "doc_id long, toks array<string>"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in span_removal_from(df).collect()
    }
    release_tracked_caches()
    assert got == expected
