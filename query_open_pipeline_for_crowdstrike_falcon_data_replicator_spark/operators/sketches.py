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


def kll_union_tree(
    df: DataFrame, keys: list[str], sketch_col: str, fanin: int = 32
) -> DataFrame:
    """True mergeable KLL union for groups of ANY width: a tree fold in
    ``ceil(log_fanin(n))`` rounds, each round collecting at most ``fanin``
    sketches per reducer and merging them with the two-sketch scalar
    merge.  Bounded state per task at every level — the aggregate a
    year-wide (365-sketch) or corpus-wide union needs, where a flat
    ``collect_list`` would buffer every blob in one row.

    KLL lacks a built-in union aggregate (HLL has ``hll_union_agg``);
    this supplies the equivalent as a plan composition: per round, rows
    are slotted ``row_number() div fanin`` within their key and each slot
    folds its <= fanin sketches.  Returns one (keys..., sketch) row per
    group."""
    from pyspark.sql import Window

    if fanin < 2:
        raise ValueError("fanin must be >= 2")
    out = df.select(*keys, F.col(sketch_col).alias("_kll"))
    # one cheap count pass bounds the number of rounds (the input is a
    # rollup table — days/hours per group — not the raw feed)
    max_n = out.groupBy(*keys).count().agg(F.max("count")).collect()[0][0] or 0
    fold = lambda lst: F.aggregate(  # noqa: E731
        F.slice(lst, 2, 2_000_000_000),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    while max_n > 1:
        w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id())
        out = (
            out.withColumn(
                "_slot", ((F.row_number().over(w) - 1) / fanin).cast("int")
            )
            .groupBy(*keys, "_slot")
            .agg(F.collect_list("_kll").alias("_lst"))
            .select(*keys, fold(F.col("_lst")).alias("_kll"))
        )
        max_n = -(-max_n // fanin)
    return out.withColumnRenamed("_kll", sketch_col)


def sketch_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-range dashboard answer FROM the daily rollup: distinct users
    (HLL union aggregate) and value quantiles (KLL tree union) over ALL
    days, one output row — the "last N days" query shape where N is wide
    enough that the flat per-group collect would not be bounded.  The raw
    feed is never rescanned; fanin=8 exercises a genuinely multi-level
    tree over the ~30 daily sketches."""
    daily = daily_sketches(spark, sf_dir).withColumn("_all", F.lit(1))
    kll = kll_union_tree(daily, ["_all"], "value_kll", fanin=8)
    hll = daily.groupBy("_all").agg(
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
    )
    q = lambda p: F.round(  # noqa: E731
        F.kll_sketch_get_quantile_double(F.col("value_kll"), F.lit(p)), 2
    )
    return (
        hll.join(kll, "_all")
        .select(
            "n_events",
            "approx_users",
            q(0.5).alias("approx_p50_value"),
            q(0.99).alias("approx_p99_value"),
        )
    )


SKETCH_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # approximate by construction -> no exact oracle (rows-only check);
    # accuracy + merge-consistency pinned in tests/test_sketches.py
    "events_sketch_rollup": (sketch_rollup, None),
    "events_sketch_range": (sketch_range_query, None),
}
