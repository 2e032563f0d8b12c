"""Mergeable-sketch rollups over the event feed (DataSketches built-ins).

The hypertable rollup (`plans/relational.py`) pre-aggregates sums/counts
per day, but COUNT DISTINCT and quantiles don't pre-aggregate — unless
the daily table stores SKETCHES.  Daily HLL (distinct users) and KLL
(value quantiles) sketches are small (~KB), mergeable, and answer any
date-range question by unioning the covered days' sketches instead of
rescanning the raw 100 TB feed — the standard lakehouse pattern for
"distinct users last N days" dashboards.

Estimates are approximate (HLL lgK=12 -> ~1.6% relative error), so there
is no exact DuckDB oracle; the driver records a rows-only check and
`tests/test_sketches.py` pins merge-consistency (merged daily sketches ==
whole-range sketch) and accuracy vs the exact answers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-rollup shape: per day, an HLL sketch of user_id and a
    KLL sketch of value next to the exact additive aggregates.  One scan,
    one shuffle on day — identical cost profile to a plain daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.hll_sketch_agg("user_id").alias("users_hll"),
        F.kll_sketch_agg_double("value").alias("value_kll"),
    )


def sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query answered FROM the daily sketches: distinct users and
    value quantiles per week, merging each week's 7 daily sketches —
    the raw feed is never rescanned.

    Weeks are keyed by ``date_trunc('week', day)`` (the Monday), not
    ``weekofyear`` alone: a bare ISO week number collides across years
    (week 3 of 2025 merging into week 3 of 2026) and mixes years at the
    52/53 boundary."""
    daily = daily_sketches(spark, sf_dir)
    # KLL ships only a two-sketch scalar merge (no union aggregate like
    # HLL's hll_union_agg), so fold it over the week's collected sketches —
    # at most 7 ~KB blobs per group, driver never involved
    kll_list = F.collect_list("value_kll")
    kll_merged = F.aggregate(
        F.slice(kll_list, 2, 366),
        F.element_at(kll_list, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return (
        daily.groupBy(F.date_trunc("week", "day").alias("week"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
            F.round(
                F.kll_sketch_get_quantile_double(kll_merged, F.lit(0.5)), 2
            ).alias("approx_p50_value"),
        )
        .orderBy("week")
    )


SKETCH_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # approximate by construction -> no exact oracle (rows-only check);
    # accuracy + merge-consistency pinned in tests/test_sketches.py
    "events_sketch_rollup": (sketch_rollup, None),
}
