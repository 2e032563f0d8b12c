"""End-to-end batch pipeline: gzip NDJSON -> 13 OCSF parquet tables +
quarantine, schemas conforming to ocsf.schemas, event-time partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.ocsf.schemas import (
    OCSF_SCHEMAS,
    TABLE_KEYS,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.pipeline import (
    run_batch,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.parquet import (
    register_ocsf_tables,
)

from .fdr_fixtures import EXPECTED_COUNTS, write_fixture_files


@pytest.fixture(scope="module")
def ocsf_out(spark, tmp_path_factory):
    src = write_fixture_files(str(tmp_path_factory.mktemp("fdr_raw")))
    out = str(tmp_path_factory.mktemp("ocsf"))
    run_batch(spark, src, out, region="us-east-1", account_id="123456789012", mode="overwrite")
    return out


def test_row_counts(spark, ocsf_out):
    for key, expected in EXPECTED_COUNTS.items():
        n = spark.read.parquet(f"{ocsf_out}/{key}").count()
        assert n == expected, f"{key}: {n} != {expected}"


def test_schemas_conform(spark, ocsf_out):
    for key in TABLE_KEYS:
        df = spark.read.parquet(f"{ocsf_out}/{key}")
        expected = OCSF_SCHEMAS[key][2]
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for f in expected.fields:
            assert got.get(f.name) == f.dataType.simpleString(), (
                f"{key}.{f.name}: {got.get(f.name)} != {f.dataType.simpleString()}"
            )
        for p in ("region", "accountId", "eventDay"):
            assert p in got, f"{key} missing partition col {p}"


def test_envelope_invariant(spark, ocsf_out):
    """type_uid == class_uid*100 + activity_id on every row (SURVEY.md X3)."""
    for key in TABLE_KEYS:
        df = spark.read.parquet(f"{ocsf_out}/{key}")
        bad = df.filter(
            F.col("type_uid") != F.col("class_uid") * 100 + F.col("activity_id")
        ).count()
        assert bad == 0, key


def test_event_day_partitioning(spark, ocsf_out):
    df = spark.read.parquet(f"{ocsf_out}/process_activity")
    days = {str(r.eventDay) for r in df.select("eventDay").distinct().collect()}
    assert days == {"20240610"}
    # sentinel timestamp lands in the 1998 partition (load-bearing default)
    dc = spark.read.parquet(f"{ocsf_out}/device_config_state")
    days = {str(r.eventDay) for r in dc.select("eventDay").distinct().collect()}
    assert "19980424" in days


def test_quarantine(spark, ocsf_out):
    corrupt = spark.read.parquet(f"{ocsf_out}/_quarantine/corrupt_lines")
    assert corrupt.count() == 1
    nodisc = spark.read.parquet(f"{ocsf_out}/_quarantine/no_discriminator")
    assert nodisc.count() == 1
    unmapped = spark.read.parquet(f"{ocsf_out}/_quarantine/unmapped_events")
    rows = unmapped.collect()
    assert len(rows) == 1 and rows[0].event_name == "SomeFutureEvent"


def test_register_and_query(spark, ocsf_out):
    registered = register_ocsf_tables(spark, ocsf_out)
    assert "ocsf_all" in registered
    # the Phase-1 flagship query (SURVEY.md §7): SQL over the OCSF tables,
    # with partition pruning on eventDay
    out = spark.sql(
        "SELECT device.uid AS device_uid, count(*) AS n FROM process_activity "
        "WHERE eventDay = '20240610' GROUP BY device.uid"
    ).collect()
    assert out and all(r.n >= 1 for r in out)
    total = spark.sql("SELECT count(*) AS n FROM ocsf_all").collect()[0].n
    assert total == sum(EXPECTED_COUNTS.values())


def test_unmapped_residual(spark, ocsf_out):
    row = (
        spark.read.parquet(f"{ocsf_out}/process_activity")
        .filter(F.col("metadata.uid") == "evt-0001")
        .select("unmapped")
        .collect()[0]
    )
    # consumed keys are gone; the discriminator and unknown keys remain
    assert row.unmapped == {
        "event_simpleName": "ProcessRollup2",
        "SomeUnmappedKey": "v1",
    }


def test_cast_failure_quarantine(spark, tmp_path):
    """E5: rows whose direct numeric/timestamp cast would silently null a
    present raw value are DIVERTED to _quarantine/cast_failures (the
    reference Firehose's failures/ prefix), not written with nulled
    fields; clean rows are untouched."""
    import json

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.pipeline import (
        process_batch,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.fdr import (
        parse_fdr_lines,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.sample import (
        FIXTURES,
    )

    net = next(
        e for e in FIXTURES if e.get("event_simpleName") == "NetworkConnectIP4"
    )
    proc = next(
        e for e in FIXTURES if e.get("event_simpleName") == "ProcessRollup2"
    )
    bad_port = dict(net, RemotePort="80x", id="evt-badport")
    bad_pid = dict(proc, RawProcessId="not-a-pid", id="evt-badpid")
    bad_ts = dict(net, timestamp="yesterday", id="evt-badts")
    lines = [json.dumps(e) for e in (net, proc, bad_port, bad_pid, bad_ts)]
    out = str(tmp_path / "ocsf")
    parsed = parse_fdr_lines(
        spark.createDataFrame([(l,) for l in lines], ["value"]).repartition(1)
    )
    process_batch(spark, parsed, out, mode="overwrite")

    q = spark.read.parquet(f"{out}/_quarantine/cast_failures").collect()
    by_sink = {}
    for r in q:
        by_sink.setdefault(r.sink, []).append(sorted(r.bad_fields))
    assert {k: sorted(v) for k, v in by_sink.items()} == {
        "network_activity": [["RemotePort"], ["timestamp"]],
        "process_activity": [["RawProcessId"]],
    }, by_sink
    # diverted rows never reach the typed tables; the clean ones do
    net_rows = spark.read.parquet(f"{out}/network_activity").collect()
    assert len(net_rows) == 1 and net_rows[0].dst_endpoint.port == 443
    proc_rows = spark.read.parquet(f"{out}/process_activity").collect()
    assert len(proc_rows) == 1 and proc_rows[0].process.pid == 4832


def test_txn_commit_replay_idempotent(spark, tmp_path):
    """Exactly-once sink commit: a replayed batch is a no-op after full
    commit, and after a simulated MID-publish death (manifest present,
    files moved, no done marker) the retry un-publishes its own files
    first — row counts never double."""
    import glob
    import json as _json
    import os

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.router import (
        classify,
        normalized_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.txn import (
        commit_batch_exactly_once,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.fdr import (
        parse_fdr_lines,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.sample import (
        FIXTURES,
    )

    base = str(tmp_path / "lake")
    lines = spark.createDataFrame(
        [(_json.dumps(e),) for e in FIXTURES], ["value"]
    ).repartition(1)
    classified = classify(parse_fdr_lines(lines), spark).persist()
    tables = normalized_tables(classified)

    assert commit_batch_exactly_once(spark, tables, base, 7) is True
    count1 = spark.read.parquet(f"{base}/process_activity").count()
    assert count1 > 0

    # full replay: done marker short-circuits, nothing changes
    assert commit_batch_exactly_once(spark, tables, base, 7) is False
    assert spark.read.parquet(f"{base}/process_activity").count() == count1

    # simulated mid-publish death: files are there, manifest restored,
    # done marker gone -> retry must first delete its own files
    published = glob.glob(f"{base}/**/b7-*", recursive=True)
    assert published, "expected b7- prefixed published files"
    with open(f"{base}/_commits/7.manifest", "w") as f:
        f.write("\n".join(published))
    os.remove(f"{base}/_commits/7.done")
    assert commit_batch_exactly_once(spark, tables, base, 7) is True
    assert spark.read.parquet(f"{base}/process_activity").count() == count1
    classified.unpersist()


@pytest.mark.slow
def test_stream_exactly_once_mode(spark, tmp_path):
    """run_stream(exactly_once=True): normal path lands the same counts
    as append mode, and a restart with no new input changes nothing."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming import (
        run_stream,
    )

    src = write_fixture_files(str(tmp_path / "raw"))
    out = str(tmp_path / "ocsf")
    q = run_stream(
        spark,
        src,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        exactly_once=True,
    )
    q.awaitTermination(300)
    for key, expected in EXPECTED_COUNTS.items():
        n = spark.read.parquet(f"{out}/{key}").count()
        assert n == expected, f"{key}: {n} != {expected}"
    q2 = run_stream(
        spark,
        src,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        exactly_once=True,
    )
    q2.awaitTermination(120)
    n = spark.read.parquet(f"{out}/process_activity").count()
    assert n == EXPECTED_COUNTS["process_activity"]


def test_corrupt_gzip_file_aborts_and_skips(spark, tmp_path):
    """E1: a corrupt gzip member aborts the read by default (the
    reference's object-level BadGzipFile behavior); with
    ignore_corrupt_files=True the bad object is skipped and every line
    from the healthy objects survives."""
    import pytest as _pytest

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.fdr import (
        read_fdr,
    )

    from .fdr_fixtures import FIXTURES, write_fixture_files

    src = write_fixture_files(str(tmp_path / "raw"), with_corrupt_file=True)
    with _pytest.raises(Exception):
        read_fdr(spark, src).count()
    n = read_fdr(spark, src, ignore_corrupt_files=True).count()
    assert n == len(FIXTURES) + 1  # all fixture lines + the corrupt LINE


def test_exactly_once_commit_uri_base_path(spark, tmp_path):
    """Regression: with a scheme-qualified base path (file:, standing in
    for s3a://hdfs://), the staged-file prefix match must still see every
    staged file — a scheme-stripped comparison would publish NOTHING while
    still writing the done marker (silent batch loss)."""
    import json as _json

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.router import (
        classify,
        normalized_tables,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.txn import (
        commit_batch_exactly_once,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.fdr import (
        parse_fdr_lines,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.sample import (
        FIXTURES,
    )

    base = f"file:{tmp_path}/lake"
    lines = spark.createDataFrame(
        [(_json.dumps(e),) for e in FIXTURES], ["value"]
    ).repartition(1)
    classified = classify(parse_fdr_lines(lines), spark).persist()
    try:
        assert commit_batch_exactly_once(spark, normalized_tables(classified), base, 3)
        assert spark.read.parquet(f"{base}/process_activity").count() > 0
    finally:
        classified.unpersist()


@pytest.mark.slow
def test_stream_quarantines_ride_the_fenced_commit(spark, tmp_path):
    """exactly_once mode publishes quarantine side outputs INSIDE the
    manifest-fenced commit (not as post-marker appends that a replay
    would skip): the corrupt fixture line lands in _quarantine exactly
    once, and a no-new-input restart adds nothing."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming import (
        run_stream,
    )

    src = write_fixture_files(str(tmp_path / "raw"))
    out = str(tmp_path / "ocsf")
    for _ in range(2):  # second run = replay with no new files
        q = run_stream(
            spark,
            src,
            out,
            checkpoint=str(tmp_path / "ckpt"),
            exactly_once=True,
        )
        q.awaitTermination(300)
        assert spark.read.parquet(f"{out}/_quarantine/corrupt_lines").count() == 1
