"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join, composed from exchange+window / bucket-join primitives
(SURVEY.md §2.4 'custom operators' guidance — composition first, no UDFs).

Both run over the ``events`` feed and have exact DuckDB oracles (DuckDB
has a native ASOF JOIN; the range join oracles as a plain inequality
join).

Scale design:
- as-of: the union-sort pattern — one shuffle on user_id, one in-partition
  sort, a last-non-null carry-forward window.  No per-row probes, no
  range explosion; this is how kdb/Flink-style as-of joins map to Spark.
- range join: candidate generation via time bucketing (join on the
  coarse bucket and its successor, then exact range filter) — turns the
  O(n^2)-per-key inequality join into an equi join Catalyst can hash;
  bucket width = the range width so each probe touches <= 2 buckets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

RANGE_SECONDS = 300  # error -> follow-up window


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it
    (classic attribution as-of join), left semantics.

    Implementation: tag clicks 0 / purchases 1, union, and carry the last
    click forward with ``last(ignorenulls)`` over (user_id, ts, tag) —
    same-timestamp clicks sort before the purchase, matching ASOF's
    ``p.ts >= c.ts``.  Same-user-same-ts click ties are collapsed to
    max(event_id) on both engines so the matched row is deterministic."""
    ev = _events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("tag"),
                F.lit(None).cast("long").alias("purchase_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("tag"), F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "user_id", "ts", "tag", "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last(
            F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True
        ).over(w).alias("click_ts"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_id",
        (F.col("ts").cast("long") - F.col("click_ts").cast("long")).alias(
            "secs_since_click"
        ),
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts, c.click_id,
       CAST(datediff('second', TIMESTAMP '1970-01-01', p.ts)
            - datediff('second', TIMESTAMP '1970-01-01', c.ts) AS BIGINT) AS secs_since_click
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def range_join_error_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events by the same user within RANGE_SECONDS after an error event.

    Candidates come from an equi join on (user_id, time bucket): each
    right-side event joins its own bucket and the previous one (bucket
    width == range width, so any in-range pair shares one of the two),
    then the exact range predicate filters.  Shuffles on (user, bucket)
    keys only — never a per-user cross product."""
    ev = _events(spark, sf_dir)
    bucket = (F.col("ts").cast("long") / RANGE_SECONDS).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
        bucket.alias("bucket"),
    )
    follows = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id"),
        F.col("event_type").alias("follow_type"),
        F.col("ts").alias("follow_ts"),
        F.explode(F.array(bucket, bucket - 1)).alias("bucket"),
    )
    dt = F.col("follow_ts").cast("long") - F.col("error_ts").cast("long")
    return (
        errors.join(follows, ["user_id", "bucket"])
        .filter(
            (F.col("follow_ts") > F.col("error_ts"))
            & (F.col("follow_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {RANGE_SECONDS} SECONDS"))
            & (F.col("follow_id") != F.col("error_id"))
        )
        .select("error_id", "user_id", "follow_id", "follow_type", dt.alias("secs_after"))
        .distinct()
    )


RANGE_SQL = f"""
SELECT e.event_id AS error_id, e.user_id, f.event_id AS follow_id,
       f.event_type AS follow_type,
       CAST(datediff('second', TIMESTAMP '1970-01-01', f.ts)
            - datediff('second', TIMESTAMP '1970-01-01', e.ts) AS BIGINT) AS secs_after
FROM events e
JOIN events f
  ON e.user_id = f.user_id
 AND f.ts > e.ts
 AND f.ts <= e.ts + INTERVAL {RANGE_SECONDS} SECOND
 AND f.event_id <> e.event_id
WHERE e.event_type = 'error'
"""


TEMPORAL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "asof_join_clicks": (asof_join_clicks, ASOF_SQL),
    "range_join_error_follow": (range_join_error_follow, RANGE_SQL),
}
