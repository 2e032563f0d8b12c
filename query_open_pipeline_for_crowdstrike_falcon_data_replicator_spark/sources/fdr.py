"""FDR gzip-NDJSON source (S3 in the reference; S1/S3 in SURVEY.md §2.1).

The reference downloads each object, gunzips, splits lines and json.loads
per line (qopcfdr_stream_loader.py:88-113).  Spark's text source reads
``*.gz`` natively (object-level parallelism — gzip is non-splittable, so one
task per file, exactly the reference's per-object granularity).

Each line is parsed TWICE on purpose:
- as ``map<string,string>`` (the ``raw`` column): preserves every key for
  the residual ``unmapped`` semantics (SURVEY.md X7) — a fixed StructType
  would silently drop unknown keys;
- the original line is kept (``value``) so structurally different payloads
  (Event_ExternalApiEvent's AuditKeyValues array) can be re-parsed with a
  typed schema where needed.

Corrupt lines parse to NULL maps and are quarantined, the DLQ the reference
lists as future work (README.md:86, SURVEY.md E6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

RAW_MAP = MapType(StringType(), StringType())


def parse_fdr_lines(text_df: DataFrame) -> DataFrame:
    """text (``value``) -> value/raw/event_name, dropping blank lines.

    ``event_name`` is the reference's 3-way discriminator fallback
    (event_simpleName -> event_type -> EventType,
    qopcfdr_stream_loader.py:115-127)."""
    df = text_df.filter(F.length(F.trim(F.col("value"))) > 0)
    df = df.withColumn("raw", F.from_json("value", RAW_MAP))
    return df.withColumn(
        "event_name",
        F.coalesce(
            F.col("raw")["event_simpleName"],
            F.col("raw")["event_type"],
            F.col("raw")["EventType"],
        ),
    )


def read_fdr(
    spark: SparkSession, path: str, *, ignore_corrupt_files: bool = False
) -> DataFrame:
    """Batch reader: ``path`` may be a file, directory or glob of .gz/.json
    NDJSON (the README.md:78 'copy objects' replay workflow, native).

    ignore_corrupt_files=False (default) aborts on a corrupt gzip member —
    the reference's object-level BadGzipFile behavior (E1,
    qopcfdr_stream_loader.py:102-110); True skips the bad object and
    processes the rest (per-read ``ignoreCorruptFiles`` datasource option)."""
    reader = spark.read
    if ignore_corrupt_files:
        reader = reader.option("ignoreCorruptFiles", "true")
    return parse_fdr_lines(reader.text(path))


def read_fdr_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 10
) -> DataFrame:
    """Streaming reader: file-source discovery replaces the reference's S3
    EventBridge notifications (S1); ``maxFilesPerTrigger`` plays the role of
    the 10-object notification batch (QOPCFDR_DataCollectionSupport_CFN.yaml:1829)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_fdr_lines(reader.load(path))


def corrupt_lines(parsed: DataFrame) -> DataFrame:
    """Quarantine: lines that failed JSON parsing (E1/E6)."""
    return parsed.filter(F.col("raw").isNull()).select("value")


def no_discriminator(parsed: DataFrame) -> DataFrame:
    """Quarantine: JSON lines missing all three discriminator keys
    (dropped+logged in the reference, qopcfdr_stream_loader.py:123-127)."""
    return parsed.filter(
        F.col("raw").isNotNull() & F.col("event_name").isNull()
    ).select("value", "raw")
