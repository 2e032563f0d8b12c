"""Small-file compaction (sinks/compact.py): row preservation, file-count
reduction, partition selectivity, and crash-recovery via the manifest."""

from __future__ import annotations

import os
import posixpath

import pytest
from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.compact import (
    compact_table,
    recover_compaction,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.txn import (
    _fs,
    _jpath,
    _write_text,
)


def _fragmented_table(spark, path, *, appends=5, rows_per=40):
    """Simulate micro-batch appends: `appends` writes x 2 eventDay
    partitions, 2 files per write -> 2*appends files per partition."""
    for b in range(appends):
        (
            spark.range(rows_per)
            .select(
                (F.col("id") + b * rows_per).alias("id"),
                (F.col("id") % 2).cast("string").alias("eventDay"),
            )
            .repartition(2)
            .write.partitionBy("eventDay")
            .mode("append")
            .parquet(path)
        )


def _data_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        # component check: pytest's tmp dir itself contains "_compact"
        if "_compact" in os.path.relpath(root, path).split(os.sep):
            continue
        out += [
            os.path.join(root, f)
            for f in files
            if not f.startswith(("_", "."))
        ]
    return out


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _fragmented_table(spark, path)
    before = spark.read.parquet(path)
    before_rows = sorted(r.id for r in before.collect())
    n_before = len(_data_files(path))
    assert n_before >= 20  # genuinely fragmented

    stats = compact_table(spark, path, min_files=4)
    assert stats["partitions_compacted"] == 2
    assert stats["files_before"] == n_before
    # tiny partitions -> 1 output file each
    assert len(_data_files(path)) == stats["files_after"] == 2

    after = spark.read.parquet(path)
    assert sorted(r.id for r in after.collect()) == before_rows
    assert after.groupBy("eventDay").count().count() == 2
    # idempotent: nothing left above threshold
    assert compact_table(spark, path, min_files=4)["partitions_compacted"] == 0


def test_compact_skips_small_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _fragmented_table(spark, path, appends=1)  # 2 files per partition
    files = set(_data_files(path))
    stats = compact_table(spark, path, min_files=4)
    assert stats["partitions_compacted"] == 0
    assert set(_data_files(path)) == files  # untouched


def test_compact_recovery_replays_manifest(spark, tmp_path):
    """A manifest left by a crash mid-swap (files staged, nothing moved or
    deleted yet) must be applied to convergence by the next run."""
    path = str(tmp_path / "tbl")
    _fragmented_table(spark, path)
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())
    olds = _data_files(path)

    # stage a replacement for partition eventDay=0 by hand
    fs, _ = _fs(spark, path)
    staged = posixpath.join(path, "_compact", "staging", "0")
    part_dir = posixpath.join(path, "eventDay=0")
    spark.read.parquet(part_dir).repartition(1).write.mode("overwrite").parquet(staged)
    staged_file = next(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    lines = [
        f"MV {posixpath.join(staged, staged_file)}\t"
        f"{posixpath.join(part_dir, 'cdeadbeef-' + staged_file)}"
    ]
    lines += [f"DEL {p}" for p in olds if "/eventDay=0/" in p]
    _write_text(
        spark, fs, posixpath.join(path, "_compact", "manifest"), "\n".join(lines)
    )

    assert recover_compaction(spark, path) is True
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before_rows
    day0 = [f for f in _data_files(path) if "/eventDay=0/" in f]
    assert len(day0) == 1 and "cdeadbeef-" in day0[0]
    # second recovery is a no-op (manifest cleared)
    assert recover_compaction(spark, path) is False
    assert not fs.exists(_jpath(spark, posixpath.join(path, "_compact")))


def test_compact_uri_table_path(spark, tmp_path):
    """Regression: a scheme-qualified table path (file:, standing in for
    s3a://hdfs://) must compact correctly — path comparisons and reads go
    through fully-qualified URIs, not scheme-stripped strings."""
    local = str(tmp_path / "tbl")
    _fragmented_table(spark, local)
    uri = f"file:{local}"
    before_rows = sorted(r.id for r in spark.read.parquet(uri).collect())
    stats = compact_table(spark, uri, min_files=4)
    assert stats["partitions_compacted"] == 2
    assert len(_data_files(local)) == stats["files_after"] == 2
    assert sorted(r.id for r in spark.read.parquet(uri).collect()) == before_rows


@pytest.mark.slow
def test_twin_compaction_crash_replay(spark, tmp_path, monkeypatch):
    """Twin snapshot compaction survives a mid-compaction crash: a
    compactor that dies after staging but before its manifest commit
    leaves the table at its prior version (orphans only); the twin's
    batch replay is still fenced; and the rescheduled compaction (the
    mark == batch_id condition holds on a last-batch replay) lands with
    identical rows and tightened file count."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks import (
        snapshot as snap,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.compaction import (
        compact_twin_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        CLEAN_TABLE,
        WINDOWS_TABLE,
        extend_span_clean,
    )

    out = str(tmp_path / "span")
    app = "span-crash-test"

    def batch(b):
        return spark.createDataFrame(
            [
                (b * 10 + i, " ".join(f"w{b}x{i}n{j}" for j in range(40)))
                for i in range(3)
            ],
            ["doc_id", "text"],
        )

    for b in range(3):
        extend_span_clean(spark, batch(b), out, b, txn_app=app)
    wpath = f"{out}/{WINDOWS_TABLE}"
    v_before = snap.current_version(spark, wpath)
    rows_before = sorted(
        (r.w, r.owner) for r in snap.read_snapshot(spark, wpath).collect()
    )

    # compaction dies between staging and commit
    real_commit = snap._commit

    def dying_commit(*a, **kw):
        raise RuntimeError("simulated crash mid-compaction")

    monkeypatch.setattr(snap, "_commit", dying_commit)
    try:
        compact_twin_tables(
            spark,
            out,
            [CLEAN_TABLE, WINDOWS_TABLE],
            txn_app=app,
            batch_id=2,
            canonical=WINDOWS_TABLE,
            compact_every=1,
        )
        raise AssertionError("compaction should have crashed")
    except RuntimeError:
        pass
    monkeypatch.setattr(snap, "_commit", real_commit)

    # table undisturbed: same version, same rows; staged files are
    # unreferenced orphans
    assert snap.current_version(spark, wpath) == v_before
    assert (
        sorted((r.w, r.owner) for r in snap.read_snapshot(spark, wpath).collect())
        == rows_before
    )

    # the streaming replay of the last batch: extend is fenced ...
    extend_span_clean(spark, batch(2), out, 2, txn_app=app)
    assert snap.current_version(spark, wpath) == v_before
    # ... and the rescheduled compaction fires (mark == batch_id) with
    # identical rows and a bounded file count
    done = compact_twin_tables(
        spark,
        out,
        [CLEAN_TABLE, WINDOWS_TABLE],
        txn_app=app,
        batch_id=2,
        canonical=WINDOWS_TABLE,
        compact_every=1,
    )
    assert done == [CLEAN_TABLE, WINDOWS_TABLE]
    assert (
        sorted((r.w, r.owner) for r in snap.read_snapshot(spark, wpath).collect())
        == rows_before
    )
    assert len(snap.snapshot_files(spark, wpath)) < 3
    # a replay of an OLDER batch can never recompact
    assert (
        compact_twin_tables(
            spark,
            out,
            [CLEAN_TABLE, WINDOWS_TABLE],
            txn_app=app,
            batch_id=1,
            canonical=WINDOWS_TABLE,
            compact_every=1,
        )
        == []
    )


@pytest.mark.slow
def test_twin_compaction_bounds_live_files_long_run(spark, tmp_path):
    """Long-run twin maintenance (20 micro-batches through spanmaint,
    compact_every=5): the compacted run holds MANY fewer live files in
    every snapshot table than the append-only run, the table contents
    stay identical, and the trickle probe still file-skips against the
    compacted (range-tightened) window index."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
        read_snapshot_pruned,
        snapshot_files,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.compaction import (
        compact_twin_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        CLEAN_TABLE,
        WINDOWS_TABLE,
        extend_span_clean,
    )

    n_batches, per_batch = 20, 4

    def batch(b):
        return spark.createDataFrame(
            [
                (
                    b * per_batch + i,
                    " ".join(f"t{b}x{i}n{j}" for j in range(45)),
                )
                for i in range(per_batch)
            ],
            ["doc_id", "text"],
        )

    def run(out, compact_every):
        app = f"span-longrun-{compact_every}"
        for b in range(n_batches):
            extend_span_clean(spark, batch(b), out, b, txn_app=app)
            # target_files=4 keeps the compacted index multi-file
            # (range-disjoint), so the probe's file-skip stays
            # observable at this toy scale
            compact_twin_tables(
                spark,
                out,
                [CLEAN_TABLE, WINDOWS_TABLE],
                txn_app=app,
                batch_id=b,
                canonical=WINDOWS_TABLE,
                compact_every=compact_every,
                target_files=4,
            )

    plain, compacted = str(tmp_path / "plain"), str(tmp_path / "compacted")
    run(plain, None)
    run(compacted, 5)

    def rows(out, table):
        return sorted(map(tuple, read_snapshot(spark, f"{out}/{table}").collect()))

    for t in (CLEAN_TABLE, WINDOWS_TABLE):
        assert rows(plain, t) == rows(compacted, t), t
        n_plain = len(snapshot_files(spark, f"{plain}/{t}"))
        n_comp = len(snapshot_files(spark, f"{compacted}/{t}"))
        # 20 appends accumulate >= 20 files; the compacted run is
        # bounded by (batches since last compaction) + compacted set
        assert n_plain >= n_batches, (t, n_plain)
        assert n_comp <= n_plain // 2, (t, n_comp, n_plain)

    # the trickle probe still prunes: a one-window probe against the
    # compacted index reads fewer files than the snapshot holds
    some = [
        r.w
        for r in read_snapshot(spark, f"{compacted}/{WINDOWS_TABLE}")
        .limit(1)
        .collect()
    ]
    pruned = read_snapshot_pruned(spark, f"{compacted}/{WINDOWS_TABLE}", some)
    n_read = pruned.select(F.input_file_name()).distinct().count()
    assert n_read < len(snapshot_files(spark, f"{compacted}/{WINDOWS_TABLE}"))



@pytest.mark.slow
def test_twin_compaction_file_count_trigger(spark, tmp_path):
    """max_live_files triggers compaction when the canonical table's
    live file count reaches the threshold — the self-scaling cadence:
    it fires when the manifest is crowded, regardless of batch number,
    and stays quiet while the file count is bounded."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
        snapshot_files,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.compaction import (
        compact_twin_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.spanmaint import (
        CLEAN_TABLE,
        WINDOWS_TABLE,
        extend_span_clean,
    )

    out = str(tmp_path / "span")
    app = "span-filecount-test"
    threshold = 4
    fired_at = []
    for b in range(8):
        batch = spark.createDataFrame(
            [
                (b * 4 + i, " ".join(f"f{b}x{i}n{j}" for j in range(45)))
                for i in range(4)
            ],
            ["doc_id", "text"],
        )
        extend_span_clean(spark, batch, out, b, txn_app=app)
        done = compact_twin_tables(
            spark,
            out,
            [CLEAN_TABLE, WINDOWS_TABLE],
            txn_app=app,
            batch_id=b,
            canonical=WINDOWS_TABLE,
            max_live_files=threshold,
        )
        if done:
            fired_at.append(b)
        # the invariant the trigger exists for: the manifest never grows
        # far past the threshold plus one batch's own appends (bounded
        # loosely at 8 — appends-per-batch vary with parallelism)
        n_live = len(snapshot_files(spark, f"{out}/{WINDOWS_TABLE}"))
        assert n_live <= threshold + 8, (b, n_live)

    assert fired_at, "file-count trigger never fired"
    # content is untouched by however many compactions fired
    assert read_snapshot(spark, f"{out}/{WINDOWS_TABLE}").count() > 0
    total = read_snapshot(spark, f"{out}/{CLEAN_TABLE}").count()
    assert total == 32  # every doc of every batch, exactly once
