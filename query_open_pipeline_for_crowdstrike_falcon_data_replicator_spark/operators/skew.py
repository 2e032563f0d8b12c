"""Skew mitigation: deterministic salted join.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime; this operator is the *explicit* form for joins AQE can't split —
e.g. a hot build-side key under a shuffled hash join, or engines/configs
without AQE.  Pattern: the probe side scatters each row into one of
``salt_n`` sub-keys via a deterministic hash of a tiebreaker column; the
build side replicates every row across all ``salt_n`` sub-keys.  The join
key becomes (key, salt), splitting a hot key's row group across salt_n
tasks.  Join results are exactly those of the unsalted join (verified in
tests/test_plans.py).

Deterministic salting (hash of a column, not rand()) keeps the operator
replayable — the same inputs always produce the same physical row routing,
which matters for debugging and for streaming restarts."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    *,
    salt_n: int = 8,
    probe_salt_col: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` and ``build`` on ``key`` with ``salt_n``-way salting.

    probe_salt_col: column whose hash scatters probe rows (defaults to the
    whole probe row via xxhash64 of all columns — any stable per-row value
    works; higher cardinality = more even scatter).

    Only probe-preserving join types are allowed: the build side is
    replicated across all salt_n sub-keys, so right/full outer joins
    would emit every unmatched build row salt_n times."""
    allowed = {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins only (the "
            f"build side is replicated; right/full would duplicate "
            f"unmatched build rows), got how={how!r}"
        )
    if probe_salt_col is None:
        salt_src = F.xxhash64(*[F.col(c) for c in probe.columns])
    elif isinstance(probe_salt_col, str):
        salt_src = F.xxhash64(F.col(probe_salt_col))
    else:
        salt_src = F.xxhash64(probe_salt_col)
    p = probe.withColumn("_salt", F.pmod(salt_src, F.lit(salt_n)).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")
