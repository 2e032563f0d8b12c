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
    exactly_once: bool = False,
    compact_every: int | None = None,
    compact_min_files: int = 4,
) -> StreamingQuery:
    """Start the streaming pipeline.  ``trigger`` defaults to
    ``availableNow`` (catch-up/replay mode); pass e.g.
    ``{"processingTime": "120 seconds"}`` for the reference's cadence.

    exactly_once=False (default): plain appends — no reprocessing of
    completed batches, at-least-once on a MID-batch failure (the
    reference Firehose's semantics).  exactly_once=True: each batch's
    table files publish through the manifest-fenced commit in
    ``sinks/txn.py`` (stage -> manifest -> rename -> marker), so a
    replayed half-written batch first un-publishes its own files —
    effectively-once for the 13 OCSF tables.  Quarantine side outputs
    remain append-mode diagnostics in both modes.

    compact_every=N runs the small-file compactor (``sinks/compact.py``)
    over every OCSF table dir after each N-th batch, inside foreachBatch —
    the stream is the table's only writer, so the swap window has no
    concurrent appender.  A crash mid-swap is replayed to convergence by
    the next compaction pass (manifest fencing)."""
    parsed = read_fdr_stream(spark, input_path, max_files_per_trigger)

    def _maybe_compact(batch_id: int) -> None:
        if not compact_every or (batch_id + 1) % compact_every:
            return
        import os

        from ..ocsf.schemas import TABLE_KEYS
        from ..sinks.compact import compact_table
        from ..sinks.txn import _fs, _jpath

        fs, _ = _fs(spark, base_path)
        for key in TABLE_KEYS:
            path = os.path.join(base_path, key)
            if fs.exists(_jpath(spark, path)):  # table may not exist yet
                compact_table(spark, path, min_files=compact_min_files)

    def _sink(batch_df, batch_id: int) -> None:
        process_batch(
            spark, batch_df, base_path, region=region, account_id=account_id
        )
        _maybe_compact(batch_id)

    def _sink_txn(batch_df, batch_id: int) -> None:
        from ..operators.router import classify, unmapped_events
        from ..pipeline import normalized_tables_with_cast_quarantine
        from ..sinks.txn import commit_batch_exactly_once
        from ..sources.fdr import corrupt_lines, no_discriminator

        batch_df.persist()
        try:
            classified = classify(batch_df, spark)
            tables, cast_failures = normalized_tables_with_cast_quarantine(
                classified
            )
            # quarantines ride INSIDE the fenced commit: publishing them
            # after the done marker would lose them if the driver died in
            # between (the replay would see .done and skip the batch)
            commit_batch_exactly_once(
                spark,
                tables,
                base_path,
                batch_id,
                region=region,
                account_id=account_id,
                side_outputs={
                    "_quarantine/cast_failures": cast_failures,
                    "_quarantine/corrupt_lines": corrupt_lines(batch_df),
                    "_quarantine/no_discriminator": no_discriminator(
                        batch_df
                    ).drop("raw"),
                    "_quarantine/unmapped_events": unmapped_events(
                        batch_df, spark
                    ),
                },
            )
            _maybe_compact(batch_id)
        finally:
            batch_df.unpersist()

    if compact_every:
        # repair any compaction interrupted mid-swap in a previous run NOW,
        # not at the next compact_every-th batch — readers would otherwise
        # see double-counted partitions until then
        import os

        from ..ocsf.schemas import TABLE_KEYS
        from ..sinks.compact import recover_compaction
        from ..sinks.txn import _fs, _jpath

        fs, _ = _fs(spark, base_path)
        for key in TABLE_KEYS:
            path = os.path.join(base_path, key)
            if fs.exists(_jpath(spark, path)):
                recover_compaction(spark, path)

    writer = parsed.writeStream.foreachBatch(
        _sink_txn if exactly_once else _sink
    ).option("checkpointLocation", checkpoint)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
