"""Structured Streaming driver.

The reference's streaming topology (EventBridge -> SQS -> Lambda loader ->
13 SQS queues -> 13 writer Lambdas -> Firehose; SURVEY.md §3.1) becomes a
single file-source stream with a foreachBatch fan-out running the exact
same normalizer expressions as batch.  Buffering knobs map directly:
SQS batch 500/120 s + Firehose 128 MB/180 s -> trigger interval +
maxFilesPerTrigger (SURVEY.md §1.4)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipeline import process_batch
from ..sources.fdr import read_fdr_stream


def run_stream(
    spark: SparkSession,
    input_path: str,
    base_path: str,
    checkpoint: str,
    *,
    region: str = "us-east-1",
    account_id: str = "000000000000",
    max_files_per_trigger: int | None = 10,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start the streaming pipeline.  ``trigger`` defaults to
    ``availableNow`` (catch-up/replay mode); pass e.g.
    ``{"processingTime": "120 seconds"}`` for the reference's cadence."""
    parsed = read_fdr_stream(spark, input_path, max_files_per_trigger)

    def _sink(batch_df, _batch_id: int) -> None:
        process_batch(
            spark, batch_df, base_path, region=region, account_id=account_id
        )

    writer = parsed.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
