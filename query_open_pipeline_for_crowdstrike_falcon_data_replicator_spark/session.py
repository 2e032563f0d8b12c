"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[$SPARK_GRAFT_CPUS]``; the same configuration is
what we would ship to a multi-executor cluster: AQE on (runtime coalesce +
skew-join handling), shuffle partitions sized to the parallelism, UTC
session timezone (the reference normalizes timestamps in a UTC Lambda,
qopcfdr_stream_loader.py:216-225).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "qopcfdr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core avoids tiny-task
        # overhead; on a real cluster this is set to ~2-3x total cores and
        # AQE coalesces down.
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # OCSF rows have hundreds of *nested* leaf fields; the default
        # maxFields=100 silently drops whole-stage codegen for every
        # normalizer projection (~2x slower interpreted eval)
        .config("spark.sql.codegen.maxFields", "2000")
        .config("spark.sql.parquet.compression.codec", "gzip")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # some input parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # single-JVM mode: locality waiting only delays task launch (no
        # network to save), and short single-task stages would otherwise
        # sit out up to 3s/level
        .config("spark.locality.wait", "0s")
        # NOTE (r10, measured): the per-iteration Exchange the INITIAL
        # plans show above the persisted src-partitioned graph edge cache
        # never executes — AQE's TableCacheQueryStage re-plans consumers
        # once the cache materializes and recognizes its hashpartitioning,
        # so pagerank/LPA shuffle-record counts are identical with and
        # without spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
        # = false (tools/shuffle_probe.py: 4043/3987 records either way).
        # The config is therefore left at its default; judge runtime plan
        # claims with shuffle_probe, not explain() dumps.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# --------------------------------------------------------------------- #
# Query-scoped cache tracking
# --------------------------------------------------------------------- #
# Query builders that persist() an intermediate (minhash profiles, bucketed
# embeddings, q11's per-part decimals) return a LAZY DataFrame — the caller
# materializes it after the builder returns, so the builder cannot unpersist
# in a try/finally the way a self-materializing op (ivf_build_index) can.
# Instead they register the handle here, and the registry wrapper releases
# all handles from PREVIOUS queries at the start of the next one — the cache
# is live for exactly the query that built it, and a long-lived session
# (driver harness, driver_sim --all) no longer accumulates cached blocks.
_TRACKED_CACHES: list = []


def tracked_persist(df, storage_level=None):
    """persist() a query-intermediate and register it for release at the
    next query's start (see note above)."""
    df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED_CACHES.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked cache; returns how many were released."""
    n = 0
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
