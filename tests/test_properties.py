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
