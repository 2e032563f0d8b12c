"""Driver-contract entries for the FDR->OCSF pipeline itself.

The pipeline's inputs are gzip NDJSON FDR events, not the driver's parquet
tables, so these entries synthesize a deterministic in-memory batch of raw
events (the FIXTURES.md shapes), run the full classify->normalize path and
return flattened envelope results.  Not SQL-expressible over the
pre-registered views -> rows-only checks (no oracle entry)."""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fixture_lines() -> list[str]:
    from ..sources.sample import FIXTURES

    return [json.dumps(e) for e in FIXTURES]


def ocsf_pipeline_envelopes(spark: SparkSession, _sf_dir: str) -> DataFrame:
    """Full pipeline over the fixture batch; returns every class's envelope
    (class_name, class_uid, type_uid, activity, status, time, eventDay)."""
    from ..operators.router import classify, normalized_tables
    from ..sources.fdr import parse_fdr_lines
    from ..sources.tables import ensure_runtime_conf

    ensure_runtime_conf(spark)

    # 29 fixture rows: one partition, or the 13-way union scans the
    # parallelized source as 13 x defaultParallelism near-empty tasks.
    # repartition, NOT coalesce: CoalescedRDD inherits locality prefs from
    # the parallelized parent and single tasks then sit out the scheduler's
    # locality wait (~4.5s); the 29-row round-robin shuffle is free.
    lines = spark.createDataFrame(
        [(l,) for l in _fixture_lines()], ["value"]
    ).repartition(1)
    # persist: the 13-way union would otherwise re-run parse+classify
    # (including the repartition exchange) once per class branch
    classified = classify(parse_fdr_lines(lines), spark).persist()
    out = None
    for _key, df in normalized_tables(classified).items():
        part = df.select(
            "class_name",
            "class_uid",
            "type_uid",
            "activity_id",
            "activity_name",
            "status_id",
            "time",
            F.date_format("time", "yyyyMMdd").alias("event_day"),
            F.col("metadata.log_name").alias("log_name"),
        )
        out = part if out is None else out.unionByName(part)
    return out


N_THROUGHPUT = 100_000


def ocsf_normalize_100k(spark: SparkSession, _sf_dir: str) -> DataFrame:
    """Normalization throughput probe: 100k synthetic FDR events (the 29
    fixture shapes cycled JVM-side via spark.range — no driver-side data)
    pushed through parse -> classify -> all 13 normalizers; returns
    per-class envelope counts.  The reference's design ceiling is 2,000
    events/s per stream (QOPCFDR_DataCollectionSupport_CFN.yaml:34); this
    entry's bench time measures our events/s at the same work."""
    from ..operators.router import classify, normalized_tables
    from ..sources.fdr import parse_fdr_lines
    from ..sources.tables import ensure_runtime_conf

    ensure_runtime_conf(spark)
    fixtures = F.array(*[F.lit(l) for l in _fixture_lines()])
    lines = spark.range(N_THROUGHPUT).select(
        F.element_at(fixtures, (F.col("id") % len(_fixture_lines())).cast("int") + 1)
        .alias("value")
    )
    classified = classify(parse_fdr_lines(lines), spark).persist()
    out = None
    for key, df in normalized_tables(classified).items():
        part = df.groupBy("class_name", "class_uid").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.date_format("time", "yyyyMMdd")).alias("n_event_days"),
        ).withColumn("sink", F.lit(key))
        out = part if out is None else out.unionByName(part)
    return out


N_ETL = 50_000  # at sf0.1; scaled down linearly for smaller sf dirs


def ocsf_etl_50k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's core job end-to-end, including the SINK: 50k synthetic
    FDR events (scaled by the sf in ``sf_dir`` so warmup/correctness runs
    stay cheap) -> classify -> 13 normalizers -> partitioned
    (region/accountId/eventDay) GZIP-parquet writes + quarantines -> read
    the lake back and report per-sink row/partition counts.  This is the
    Spark replacement for the reference's entire S3->...->Firehose->S3
    path measured as one number."""
    import re
    import tempfile

    from ..pipeline import process_batch
    from ..sinks.parquet import PARTITION_COLS
    from ..sources.fdr import parse_fdr_lines
    from ..sources.tables import ensure_runtime_conf
    from ..ocsf.schemas import TABLE_KEYS

    ensure_runtime_conf(spark)
    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    sf = float(m.group(1)) if m else 0.1
    n = max(int(N_ETL * min(sf / 0.1, 1.0)), 1000)
    fixtures = F.array(*[F.lit(l) for l in _fixture_lines()])
    lines = spark.range(n).select(
        F.element_at(fixtures, (F.col("id") % len(_fixture_lines())).cast("int") + 1)
        .alias("value")
    )
    base = tempfile.mkdtemp(prefix="qopcfdr_etl_")
    process_batch(spark, parse_fdr_lines(lines), base, mode="overwrite")
    out = None
    for key in TABLE_KEYS:
        df = spark.read.parquet(f"{base}/{key}")
        part = df.groupBy().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*PARTITION_COLS).alias("n_partitions"),
        ).select(F.lit(key).alias("sink"), "n_rows", "n_partitions")
        out = part if out is None else out.unionByName(part)
    return out


OCSF_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "ocsf_pipeline_envelopes": (ocsf_pipeline_envelopes, None),
    "ocsf_normalize_100k": (ocsf_normalize_100k, None),
    "ocsf_etl_50k": (ocsf_etl_50k, None),
}
