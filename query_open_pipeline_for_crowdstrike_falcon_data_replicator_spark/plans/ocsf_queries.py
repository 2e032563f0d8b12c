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


def _fixture_class_rows() -> list[tuple[int, str, str, int, str | None, int | None]]:
    """Pure-Python replay of classify() + the envelope time for each fixture:
    (fixture_idx, sink, class_name, class_uid, event_day, time_ms).

    Discriminator fallback mirrors sources/fdr.py:parse_fdr_lines, routing
    mirrors operators/router.py:class_filter, and the epoch-ms/day replay
    functions/timeparse.fdr_timestamp in UTC (the queries pin the session
    timezone via ensure_runtime_conf).  Drives the DuckDB oracles below."""
    import math
    from datetime import datetime, timezone

    from ..functions.timeparse import _SECONDS_LIMIT, TIMESTAMP_SENTINEL
    from ..ocsf.event_mapping import EVENT_ROWS
    from ..ocsf.schemas import OCSF_SCHEMAS, TABLE_KEYS
    from ..sources.sample import FIXTURES

    mapping = {r[0]: r for r in EVENT_ROWS}
    class_to_key = {
        OCSF_SCHEMAS[key][0]: key
        for key in TABLE_KEYS
        if key != "http_activity_extapi"
    }

    def millis(ts: str | None) -> int | None:
        if ts is None:
            return None
        d = float(ts)
        secs = d / 1000.0 if d >= _SECONDS_LIMIT else d
        return math.floor(secs * 1000)

    def day(ms: int | None) -> str | None:
        if ms is None:
            return None
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).strftime(
            "%Y%m%d"
        )

    rows: list[tuple[int, str, str, int, str | None, int | None]] = []
    for i, e in enumerate(FIXTURES):
        name = (
            e.get("event_simpleName") or e.get("event_type") or e.get("EventType")
        )
        if not name or name not in mapping:
            continue  # quarantined (no discriminator / unmapped)
        m = mapping[name]
        class_uid, class_name = int(m[3]), str(m[4])
        if name == "Event_ExternalApiEvent":
            sink = "http_activity_extapi"
            ms = millis(e.get("UTCTimestamp"))  # extapi time has no sentinel
        else:
            sink = class_to_key[class_name]
            ms = millis(e.get("timestamp", TIMESTAMP_SENTINEL))
        rows.append((i, sink, class_name, class_uid, day(ms), ms))
    return rows


def _normalize_oracle_sql() -> str:
    """DuckDB replay of ocsf_normalize_100k: the synthetic input is
    ``range(N) % n_fixtures`` and each fixture's (sink, class, day) is a
    deterministic function of static data, so the per-class envelope
    aggregate is VALUES-join arithmetic — an engine-independent recompute
    of classification + routing + day bucketing at 100k volume."""
    rows = _fixture_class_rows()
    n_fix = len(_fixture_lines())

    def lit(d: str | None) -> str:
        return f"'{d}'" if d is not None else "NULL"

    values = ",\n    ".join(
        f"({i}, '{sink}', '{cls}', {uid}, {lit(d)})"
        for i, sink, cls, uid, d, _ms in rows
    )
    return f"""
WITH f(idx, sink, class_name, class_uid, event_day) AS (VALUES
    {values}
),
ids AS (SELECT CAST(unnest(range({N_THROUGHPUT})) % {n_fix} AS INTEGER) AS idx)
SELECT f.class_name,
       CAST(f.class_uid AS BIGINT) AS class_uid,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT f.event_day) AS BIGINT) AS n_event_days,
       f.sink
FROM ids JOIN f USING (idx)
GROUP BY f.class_name, f.class_uid, f.sink
"""


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
    # union the per-class envelope PROJECTIONS, then aggregate ONCE: the
    # rows still flow through every normalizer's projection, but the 13
    # per-branch aggregates (each a 2-exchange distinct-agg chain — 26
    # tiny exchanges / 26 extra stages of pure scheduling latency) fold
    # into one partial-aggregated shuffle pair over the unioned rows
    out = None
    for key, df in normalized_tables(classified).items():
        part = df.select(
            "class_name",
            "class_uid",
            F.date_format("time", "yyyyMMdd").alias("event_day"),
            F.lit(key).alias("sink"),
        )
        out = part if out is None else out.unionByName(part)
    return (
        out.groupBy("class_name", "class_uid", "sink")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_day").alias("n_event_days"),
        )
        .select("class_name", "class_uid", "n_events", "n_event_days", "sink")
    )


N_ETL = 50_000  # at sf0.1; scaled down linearly for smaller sf dirs


def ocsf_etl_50k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's core job end-to-end, including the SINK: 50k synthetic
    FDR events (scaled by the sf in ``sf_dir`` so warmup/correctness runs
    stay cheap) -> classify -> 13 normalizers -> partitioned
    (region/accountId/eventDay) GZIP-parquet writes + quarantines -> read
    the lake back and report per-sink row/partition counts.  This is the
    Spark replacement for the reference's entire S3->...->Firehose->S3
    path measured as one number."""
    import os
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
    # fixed final path (no per-call directory leak), staged build +
    # rename swap so a concurrent session never reads a partial lake
    import uuid

    from ..sinks.artifacts import publish_swap

    base = os.path.join(tempfile.gettempdir(), f"qopcfdr_etl_{n}")
    stage = f"{base}.stage-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    process_batch(spark, parse_fdr_lines(lines), stage, mode="overwrite")
    publish_swap(stage, base)
    out = None
    for key in TABLE_KEYS:
        df = spark.read.parquet(f"{base}/{key}")
        part = df.groupBy().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*PARTITION_COLS).alias("n_partitions"),
        ).select(F.lit(key).alias("sink"), "n_rows", "n_partitions")
        out = part if out is None else out.unionByName(part)
    return out


N_VERIFY = 20_000  # sf-independent: the oracle SQL embeds this constant


def _etl_verify_oracle_sql() -> str:
    """DuckDB replay of ocsf_etl_verify: the write->read-back probe's
    per-(sink, eventDay) counts, class cardinality and time range are —
    like _normalize_oracle_sql — pure VALUES-join arithmetic over the
    fixture replay, because the synthetic input is ``range(N) % n_fix``
    and every normalized row's (sink, event_day, time_ms) is a
    deterministic function of its fixture.  A hash-match here proves rows
    survived the partitioned write AND landed in the right eventDay
    partition directory (the read-back groups by the PARTITION column,
    not the data column)."""
    rows = _fixture_class_rows()
    n_fix = len(_fixture_lines())

    def lit(v) -> str:
        if v is None:
            return "NULL"
        return f"'{v}'" if isinstance(v, str) else str(v)

    values = ",\n    ".join(
        f"({i}, '{sink}', {uid}, {lit(d)}, {lit(ms)})"
        for i, sink, _cls, uid, d, ms in rows
    )
    return f"""
WITH f(idx, sink, class_uid, event_day, time_ms) AS (VALUES
    {values}
),
ids AS (SELECT CAST(unnest(range({N_VERIFY})) % {n_fix} AS INTEGER) AS idx)
SELECT f.sink,
       f.event_day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT f.class_uid) AS BIGINT) AS n_classes,
       CAST(min(f.time_ms) AS BIGINT) AS min_time_ms,
       CAST(max(f.time_ms) AS BIGINT) AS max_time_ms
FROM ids JOIN f USING (idx)
GROUP BY f.sink, f.event_day
"""


def _build_verify_lake(spark: SparkSession) -> str:
    """Run the full 20k-event pipeline (parse -> classify -> 13
    normalizers -> partitioned gzip-parquet writes + quarantines) into
    the FIXED verify-lake directory (overwrite — no per-call directory
    leak) and mark it built for same-process reuse by the union-view
    search below."""
    import os
    import tempfile

    from ..pipeline import process_batch
    from ..sources.fdr import parse_fdr_lines
    from ..sources.tables import ensure_runtime_conf

    import uuid

    from ..sinks.artifacts import publish_swap

    ensure_runtime_conf(spark)
    base = os.path.join(tempfile.gettempdir(), f"qopcfdr_etl_verify_{N_VERIFY}")
    fixtures = F.array(*[F.lit(l) for l in _fixture_lines()])
    lines = spark.range(N_VERIFY).select(
        F.element_at(fixtures, (F.col("id") % len(_fixture_lines())).cast("int") + 1)
        .alias("value")
    )
    # build into a process-unique staging tree, then rename-swap it in:
    # a concurrent reader of the previous lake never scans a half-written
    # overwrite (ADVICE r4), and the probe still re-runs its write path
    # every call (that IS what it verifies)
    stage = f"{base}.stage-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    process_batch(spark, parse_fdr_lines(lines), stage, mode="overwrite")
    with open(os.path.join(stage, "_lake_built"), "w") as f:
        f.write(str(N_VERIFY))
    return publish_swap(stage, base)


def ocsf_etl_verify(spark: SparkSession, _sf_dir: str) -> DataFrame:
    """Driver-oracled SINK probe (VERDICT r2 action #1): 20k synthetic FDR
    events through the FULL pipeline — parse -> classify -> 13 normalizers
    -> partitioned region/accountId/eventDay GZIP-parquet writes — then
    read the lake BACK and report per-(sink, eventDay-partition) row
    counts, class cardinality, and the min/max envelope time in epoch ms.
    Grouping on the partition directory value (not the data column) makes
    the hash-match evidence that partition extraction (reference
    create_qopcfdr_firehoses.py:136-190's JQ step), the dynamic-partition
    write, and the parquet round-trip are all value-exact."""
    from ..ocsf.schemas import TABLE_KEYS

    base = _build_verify_lake(spark)
    out = None
    for key in TABLE_KEYS:
        df = spark.read.parquet(f"{base}/{key}")
        part = (
            df.groupBy(F.col("eventDay").cast("string").alias("event_day"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct("class_uid").alias("n_classes"),
                F.min(F.unix_millis("time")).alias("min_time_ms"),
                F.max(F.unix_millis("time")).alias("max_time_ms"),
            )
            .select(F.lit(key).alias("sink"), "event_day", "n_rows",
                    "n_classes", "min_time_ms", "max_time_ms")
        )
        out = part if out is None else out.unionByName(part)
    return out


def _all_search_oracle_sql() -> str:
    """DuckDB replay of ocsf_all_search: the same VALUES-join fixture
    arithmetic as the etl-verify oracle but grouped by CLASS — which
    merges the two http_activity sinks (routed vs ExternalApi split),
    exactly what the union view exists to do."""
    rows = _fixture_class_rows()
    n_fix = len(_fixture_lines())

    def lit(v) -> str:
        if v is None:
            return "NULL"
        return f"'{v}'" if isinstance(v, str) else str(v)

    values = ",\n    ".join(
        f"({i}, '{cls}', {uid}, {lit(d)}, {lit(ms)})"
        for i, _sink, cls, uid, d, ms in rows
    )
    return f"""
WITH f(idx, class_name, class_uid, event_day, time_ms) AS (VALUES
    {values}
),
ids AS (SELECT CAST(unnest(range({N_VERIFY})) % {n_fix} AS INTEGER) AS idx)
SELECT f.class_name,
       CAST(f.class_uid AS BIGINT) AS class_uid,
       f.event_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(f.time_ms) AS BIGINT) AS min_time_ms,
       CAST(max(f.time_ms) AS BIGINT) AS max_time_ms
FROM ids JOIN f USING (idx)
GROUP BY 1, 2, 3
"""


def ocsf_all_search(spark: SparkSession, _sf_dir: str) -> DataFrame:
    """Cross-class search over the ``ocsf_all`` UNION VIEW — the Athena
    entry-point shape the reference delegates querying to (README.md:48:
    Glue crawler + Athena over the 13 sinks): register every written sink
    as a view plus the ``unionByName(allowMissingColumns=True)`` union,
    then one SQL aggregate across ALL classes at once.  Class grain
    (not sink grain) makes the union view do real work: the
    http_activity class lands in TWO sinks (routed + ExternalApi split),
    which only the cross-class view reunifies.  Reuses the verify lake
    when this process already built it."""
    import os
    import tempfile

    from ..sinks.parquet import register_ocsf_tables
    from ..sources.tables import ensure_runtime_conf

    ensure_runtime_conf(spark)
    base = os.path.join(tempfile.gettempdir(), f"qopcfdr_etl_verify_{N_VERIFY}")
    if not os.path.exists(os.path.join(base, "_lake_built")):
        base = _build_verify_lake(spark)
    register_ocsf_tables(spark, base)
    return spark.sql(
        """
        SELECT class_name,
               class_uid,
               eventDay AS event_day,
               count(*) AS n_events,
               min(unix_millis(time)) AS min_time_ms,
               max(unix_millis(time)) AS max_time_ms
        FROM ocsf_all
        GROUP BY class_name, class_uid, eventDay
        """
    )


OCSF_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "ocsf_pipeline_envelopes": (ocsf_pipeline_envelopes, None),
    "ocsf_normalize_100k": (ocsf_normalize_100k, _normalize_oracle_sql()),
    "ocsf_etl_50k": (ocsf_etl_50k, None),
    "ocsf_etl_verify": (ocsf_etl_verify, _etl_verify_oracle_sql()),
    "ocsf_all_search": (ocsf_all_search, _all_search_oracle_sql()),
}
