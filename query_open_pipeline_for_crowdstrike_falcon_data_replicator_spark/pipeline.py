"""End-to-end batch pipeline: gzip NDJSON -> classify -> 13 normalized
OCSF tables -> partitioned parquet (+ quarantine side outputs).

This one job replaces the reference's seven network hops (S3 ->
EventBridge -> SQS -> Lambda -> SQS -> Lambda -> Firehose -> S3;
SURVEY.md §3.1)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .operators.castcheck import split_cast_failures
from .operators.router import class_filter, classify, unmapped_events
from .ocsf.schemas import TABLE_KEYS
from .sinks.parquet import write_ocsf_tables
from .sources.fdr import corrupt_lines, no_discriminator, parse_fdr_lines, read_fdr


def normalized_tables_with_cast_quarantine(
    classified: DataFrame,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """R3 routing with the E5 side output: per class, rows whose typed
    cast would silently null a present raw value are DIVERTED to a
    (sink, bad_fields, value) quarantine frame instead of landing in the
    table with nulled fields — the reference Firehose's ``failures/``
    semantics (create_qopcfdr_firehoses.py:137)."""
    tables: dict[str, DataFrame] = {}
    failures: DataFrame | None = None
    for key in TABLE_KEYS:
        ok, bad = split_cast_failures(classified.filter(class_filter(key)), key)
        tables[key] = ok
        failures = bad if failures is None else failures.unionByName(bad)
    return tables, failures


def process_batch(
    spark: SparkSession,
    parsed: DataFrame,
    base_path: str,
    *,
    region: str = "us-east-1",
    account_id: str = "000000000000",
    mode: str = "append",
) -> None:
    """Route one parsed batch to the 13 sinks + quarantine tables.

    The parsed batch is cached: it is scanned 13 times (once per sink
    filter), and re-reading + re-parsing gzip JSON would dominate."""
    parsed.persist()
    try:
        classified = classify(parsed, spark)
        tables, cast_failures = normalized_tables_with_cast_quarantine(classified)
        write_ocsf_tables(
            tables,
            base_path,
            region=region,
            account_id=account_id,
            mode=mode,
        )
        quarantine = os.path.join(base_path, "_quarantine")
        cast_failures.write.mode(mode).parquet(
            os.path.join(quarantine, "cast_failures")
        )
        corrupt_lines(parsed).write.mode(mode).parquet(
            os.path.join(quarantine, "corrupt_lines")
        )
        no_discriminator(parsed).drop("raw").write.mode(mode).parquet(
            os.path.join(quarantine, "no_discriminator")
        )
        unmapped_events(parsed, spark).write.mode(mode).parquet(
            os.path.join(quarantine, "unmapped_events")
        )
    finally:
        parsed.unpersist()


def run_batch(
    spark: SparkSession,
    input_path: str,
    base_path: str,
    *,
    region: str = "us-east-1",
    account_id: str = "000000000000",
    mode: str = "append",
) -> None:
    """Batch/replay driver (the reference's 'copy objects into the bucket'
    workflow, README.md:78 — natively)."""
    process_batch(
        spark,
        read_fdr(spark, input_path),
        base_path,
        region=region,
        account_id=account_id,
        mode=mode,
    )


__all__ = ["process_batch", "run_batch", "parse_fdr_lines"]
