"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

These are the relational-surface inputs; the FDR/OCSF pipeline has its own
source module (``sources.fdr``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Make query results independent of the caller's session defaults.

    The driver hands us its own SparkSession; these must hold regardless of
    how it was built (both are runtime-settable SQL confs):
    - UTC session timezone: event-time day boundaries must match the UTC
      oracle (and the reference normalized in a UTC Lambda);
    - nanosAsLong: the events table stores TIMESTAMP(NANOS), which the
      vectorized parquet reader otherwise rejects.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # perf: nested OCSF schemas exceed the default codegen maxFields=100,
    # which silently disables whole-stage codegen for wide projections
    spark.conf.set("spark.sql.codegen.maxFields", "2000")
    # perf: a caller session still at Spark's static default of 200
    # shuffle partitions pays pure scheduling overhead on a single node
    # (AQE coalescing does not cover every stage — e.g. foreachBatch
    # work inside streaming probes); size it to the actual parallelism.
    # A caller that set a NON-DEFAULT value is left untouched; note a
    # deliberate, explicit 200 is indistinguishable from the unset
    # default at runtime (conf.get sees "200" either way) and is resized
    # too — callers that truly want 200 must set it after this call.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
    # NB: spark.locality.wait is a core conf (not runtime-settable); plans
    # that would create single-task stages over parallelized data use
    # repartition (shuffle outputs carry no locality prefs) so they never
    # sit out the wait under a caller-built session either.


def spread(spark: SparkSession, df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` on ``cols`` ONLY when the scan's natural
    parallelism is below the cluster's — the local test tables are single
    parquet files (1 split -> 1 task, serializing any CPU-bound
    projection), but a production lake has thousands of splits and the
    same repartition would just burn a full-corpus shuffle."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(par, 8):
        return df
    return df.repartition(par, *cols) if cols else df.repartition(par)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # TIMESTAMP(NANOS) parquet read via nanosAsLong -> convert to
            # microsecond TimestampType (truncation, same as DuckDB ns->us)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # newer readers ignore nanosAsLong and read TIMESTAMP(NANOS)
            # as TIMESTAMP_NTZ (nanos truncated to micros).  Cast to the
            # session-zoned TimestampType under the UTC session tz set
            # above: same instants as the nanosAsLong path, and keeps
            # every downstream epoch cast / window op working unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` works over them —
    the Spark-native replacement for the reference's Athena/Glue catalog
    (reference README.md:48)."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
