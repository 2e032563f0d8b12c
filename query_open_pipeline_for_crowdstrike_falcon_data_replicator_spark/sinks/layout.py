"""Sort-on-write data layout (clustering) for parquet data skipping.

Partition pruning (``partitionBy`` dirs) only helps predicates on the
partition columns; for everything else the scan cost is governed by
parquet row-group min/max statistics.  Writing a table range-partitioned
AND sorted by its dominant filter key gives every row group a narrow
min/max window on that key, so a pushed predicate skips whole row groups
— the poor man's Z-order, and the single highest-leverage layout decision
for a 100 TB fact table (e.g. cluster OCSF tables by ``time`` within the
eventDay partition, or lineitem by part key).

``tests/test_plans.py::test_clustered_layout_skips_row_groups`` pins the
effect through the FileSourceScan ``numOutputRows`` metric: the same
pushed filter reads ~1/N of the clustered layout vs ALL rows of an
unsorted one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    *,
    n_files: int = 0,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write ``df`` range-partitioned and sorted by ``cluster_col``.

    ``repartitionByRange`` samples the key distribution, so output files
    hold near-equal row counts with disjoint key ranges (skew-safe), and
    the sort keeps each row group's min/max tight.  ``n_files=0`` lets
    AQE/`spark.sql.shuffle.partitions` pick the file count."""
    parted = (
        df.repartitionByRange(n_files, cluster_col)
        if n_files
        else df.repartitionByRange(cluster_col)
    )
    (
        parted.sortWithinPartitions(cluster_col)
        .write.option("compression", compression)
        .mode(mode)
        .parquet(path)
    )


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 8) -> "F.Column":
    """Interleaved-bit (Morton / Z-order) sort key over ``cols``.

    Each column is first mapped to a rank-based bucket in ``[0, 2**bits)``
    via its approximate quantile boundaries — rank, not linear, bucketing,
    so skewed value distributions still spread evenly across buckets.  The
    boundaries are tiny driver-side model state (``(2**bits - 1) * len(cols)``
    doubles, same category as IVF centroids); the per-row bucket lookup and
    bit interleave are pure column expressions, fully codegen'd.

    Sorting by the returned key gives every output file/row group a narrow
    min/max window on EVERY participating column simultaneously (each is
    narrowed to ~``range / 2**(log2(n_groups)/len(cols))``), so pushed
    predicates on ANY of them skip row groups — unlike single-column
    clustering, which leaves the other columns' stats useless.  This is
    the multi-dimensional layout a 100 TB fact table filtered on several
    independent keys (e.g. OCSF ``time`` + ``severity_id``, or lineitem
    ``l_partkey`` + ``l_suppkey``) wants.
    """
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    # the interleaved key must fit a signed long: bit position
    # bits*len(cols)-1 may not reach the sign bit (position 63), or the
    # largest Morton keys go negative and sort FIRST — silently breaking
    # the clustering this helper exists to provide
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} > 63 overflows the long "
            f"sort key; lower bits to <= {63 // len(cols)} for {len(cols)} columns"
        )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        bounds = df.approxQuantile(c, probs, 1.0 / (4 * n_buckets))
        # bucket = #boundaries <= value (monotone in the value, <= n_buckets-1)
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(
            F.filter(arr, lambda b: b <= F.col(c).cast("double"))
        ).cast("long")
        for i in range(bits):
            z = z + (
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 0,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write ``df`` range-partitioned and sorted by the Z-order key of
    ``cols`` (see :func:`zorder_key`).  The key column is dropped before
    the write — it is a layout artifact, not data."""
    keyed = df.withColumn("_zkey", zorder_key(df, cols, bits=bits))
    parted = (
        keyed.repartitionByRange(n_files, "_zkey")
        if n_files
        else keyed.repartitionByRange("_zkey")
    )
    (
        parted.sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.option("compression", compression)
        .mode(mode)
        .parquet(path)
    )
